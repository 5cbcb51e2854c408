package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The persisted incremental-dedup index tier (r15): the df table,
  * orientation-2 prefix postings, and high-df route slice are
  * batch-independent history artifacts — persisted at compaction and
  * BOUND by a fresh session, the first daily batch must run at the
  * documented O(batch) cost (no history-postings window shuffle
  * inline) with byte-stable output. Reference analogue: the TSDB
  * block index, persisted at compaction and mmapped at open
  * (`vendor/github.com/prometheus/tsdb/index/index.go:101`,
  * `tsdb/compact.go:484`). */
class DedupIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def windowsIn(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size

  /** Window operators whose subtree reads the HISTORY corpus table
    * itself (root path == the corpus dir): the postings-volume shuffle
    * the persisted tier must shed. The tier's own parquet dirs
    * (`_dedup_index/...`) read back as file relations too — those may
    * legitimately sit under the BATCH-side prefix window (the df
    * order), so match the corpus path exactly, not "any file". */
  private def historyWindows(df: DataFrame, corpus: String): Int =
    df.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.collectLeaves().exists {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toUri.getPath == corpus)
              case _ => false
            }
          case _ => false
        } => w
    }.size

  private def bits(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet

  // a corpus with a boilerplate block (so the prefix machinery is the
  // live route) written as a REAL parquet table — the serving shape,
  // and what makes the "fresh session re-reads the same path" plan
  // keys realistic
  private lazy val corpusDir = {
    val dir = Files.createTempDirectory("dedup-idx-corpus").toString
    val boiler = "all rights reserved contact us terms of service apply"
    def uniq(i: Int, seed: Int) =
      (0 until 12).map(j => s"w${seed}_${i}_$j").mkString(" ")
    (0 until 50).map { i =>
      (i.toLong, if (i < 40) s"${uniq(i, 1)} $boiler" else uniq(i, 1))
    }.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val fresh = Seq(
    (100L, "w1_7_0 w1_7_1 w1_7_2 w1_7_3 w1_7_4 w1_7_5 w1_7_6 w1_7_7 " +
      "w1_7_8 w1_7_9 w1_7_10 w1_7_11 all rights reserved contact us " +
      "terms of service apply"), // near-dup of history doc 7
    (101L, "w2_0_0 w2_0_1 w2_0_2 all rights reserved contact us terms " +
      "of service apply"), // boilerplate-only overlap
    (102L, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11") // no overlap
  ).toDF("doc_id", "text")

  test("a FRESH session binds the persisted tier and serves a daily " +
      "batch without re-running the history-postings window shuffle, " +
      "byte-stable vs the inline build (r14 verdict item 1)") {
    val history = spark.read.parquet(corpusDir)
    // the canonical location beside the corpus (kept in /tmp here —
    // the fixture corpus dir doubles as a parquet table)
    val idxDir = Dedup.incrementalIndexPath(corpusDir)
    val hsets = Dedup.shingleSetsCached(history, 3)
    val fsets = Dedup.shingleSetsCached(fresh, 3)
    // inline build (the pre-r15 cold-start cost): memoized artifacts
    // computed from postings — record the expected rows
    val inlineC = bits(
      Dedup.incrementalContainmentFromSets(fsets, hsets, 0.5, 0.0))
    val inlineJ = bits(
      Dedup.incrementalJaccardFromSets(fsets, hsets, 0.5, 0.0))
    assert(inlineC.nonEmpty && inlineJ.nonEmpty, "fixture must pair")
    // the inline query windows the HISTORY postings (the
    // postings-volume shuffle this tier exists to shed)
    Dedup.clearIncrementalCaches()
    assert(historyWindows(Dedup.incrementalContainmentFromSets(
      fsets, hsets, 0.5, 0.0), corpusDir) > 0,
      "fixture lost its inline history-prefix window — spec is vacuous")
    // compaction-time build (through the memo), then a FRESH session:
    // drop every incremental memo entry and re-read the corpus path
    Dedup.ensureIncrementalIndex(hsets, idxDir, Seq(0.5))
    Dedup.clearIncrementalCaches()
    val history2 = spark.read.parquet(corpusDir)
    val hsets2 = Dedup.shingleSetsCached(history2, 3)
    assert(Dedup.bindIncrementalIndex(hsets2, idxDir),
      "fresh session failed to bind a certified index")
    // plan witness 1: the seeded history-prefix frame is a parquet
    // scan — no Window, no Aggregate (nothing recomputed)
    val hpref = Dedup.historyPrefixCached(hsets2, 0.5)
    assert(windowsIn(hpref) == 0,
      "bound history prefix still plans a window shuffle")
    assert(hpref.queryExecution.analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty, "bound history prefix still plans an aggregation")
    // plan witness 2: the END-TO-END batch job windows ONLY the batch
    // postings (batch-volume, the O(batch) term) — zero Window
    // operators read the history corpus
    val bound = Dedup.incrementalContainmentFromSets(fsets, hsets2, 0.5, 0.0)
    assert(historyWindows(bound, corpusDir) == 0,
      "bound batch job still plans a window over history postings")
    assert(windowsIn(bound) > 0,
      "batch-side prefix window should survive (sanity)")
    // oracle rows byte-stable across inline vs persisted-tier routes
    assert(bits(bound) == inlineC, "containment diverged on the tier")
    assert(bits(Dedup.incrementalJaccardFromSets(fsets, hsets2, 0.5, 0.0))
      == inlineJ, "jaccard diverged on the tier")
    // ...and with the ADAPTIVE route (default share): the seeded
    // high-df slice and docs count serve the probe — same rows either
    // way (both routes exact)
    assert(bits(Dedup.incrementalContainmentFromSets(fsets, hsets2, 0.5))
      == inlineC, "adaptive route diverged on the tier")
  }

  test("bind refuses an uncertified dir; ensure rebuilds when the " +
      "persisted config does not cover the requested thresholds/share") {
    val history = spark.read.parquet(corpusDir)
    val hsets = Dedup.shingleSetsCached(history, 3)
    val dir = Files.createTempDirectory("dedup-idx-cfg").toString
    assert(!Dedup.bindIncrementalIndex(hsets, s"$dir/never_written"),
      "bind must fail without the _ok marker")
    Dedup.writeIncrementalIndex(hsets, dir, Seq(0.5))
    // a crash mid-write leaves no marker: simulate by deleting it
    val ok = new java.io.File(dir, "_ok")
    assert(ok.exists())
    assert(ok.delete())
    assert(!Dedup.bindIncrementalIndex(hsets, dir),
      "bind must treat a marker-less dir as a crashed build")
    // ensure with a threshold the tier lacks → rebuild covers both
    Dedup.ensureIncrementalIndex(hsets, dir, Seq(0.5, 0.8))
    Dedup.clearIncrementalCaches()
    assert(Dedup.bindIncrementalIndex(hsets, dir))
    assert(windowsIn(Dedup.historyPrefixCached(hsets, 0.8)) == 0,
      "rebuilt tier must cover the added threshold")
  }
}

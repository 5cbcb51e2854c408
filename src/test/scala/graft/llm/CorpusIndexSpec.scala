package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[CorpusStore]] — the persisted dedup-index tier wired into a
  * serving lifecycle (r16): open binds-or-builds, mutations decertify
  * FIRST and rebuild, and a fresh process's first incremental batch
  * runs plan-asserted at O(batch) — the DedupIndexSpec witness through
  * the server path instead of caller-orchestrated build/bind. */
class CorpusIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val boiler = "all rights reserved contact us terms of service apply"
  private def uniq(i: Int, seed: Int) =
    (0 until 12).map(j => s"w${seed}_${i}_$j").mkString(" ")

  private def writeCorpus(dir: String): Unit =
    (0 until 50).map { i =>
      (i.toLong, if (i < 40) s"${uniq(i, 1)} $boiler" else uniq(i, 1))
    }.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)

  private def freshBatch = Seq(
    (100L, s"${uniq(7, 1)} $boiler"), // near-dup of history doc 7
    (102L, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11") // no overlap
  ).toDF("doc_id", "text")

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

  test("open builds the tier ONCE; a fresh process re-opens in " +
      "O(listing) (marker untouched) and serves its first batch with " +
      "zero history-postings windows, byte-stable") {
    val dir = Files.createTempDirectory("corpus-store").toString
    writeCorpus(dir)
    val cs = CorpusStore.open(spark, dir, thresholds = Seq(0.5))
    val first = bits(cs.containmentBatch(freshBatch, 0.5))
    assert(first.nonEmpty, "fixture must pair")
    val ok = new java.io.File(
      Dedup.incrementalIndexPath(dir).stripPrefix("file:"), "_ok")
    assert(ok.exists(), "open never certified the tier")
    val builtAt = ok.lastModified()
    // fresh process: every session memo dropped, then a plain re-open
    Dedup.clearIncrementalCaches()
    val cs2 = CorpusStore.open(spark, dir, thresholds = Seq(0.5))
    assert(ok.lastModified() == builtAt,
      "re-open REBUILT a certified, covering tier")
    val served = cs2.containmentBatch(freshBatch, 0.5)
    assert(historyWindows(served, dir) == 0,
      "first batch after re-open still plans a window over history " +
        "postings — the persisted tier was not bound")
    assert(bits(served) == first, "served rows diverged across re-open")
    assert(bits(cs2.nearDupBatch(freshBatch, 0.5)).nonEmpty,
      "near-dup route unserved after re-open")
  }

  test("append decertifies FIRST, rebuilds, and the next batch pairs " +
      "against the appended docs from the persisted tier; a crash " +
      "between decertify and rebuild heals at the next open") {
    val dir = Files.createTempDirectory("corpus-store-app").toString
    writeCorpus(dir)
    val cs = CorpusStore.open(spark, dir, thresholds = Seq(0.5, 0.9))
    val probe = Seq((200L, s"${uniq(3, 9)} $boiler")).toDF("doc_id", "text")
    // doc 9_3 is not in history yet: boilerplate-only overlap pairs may
    // exist, but no pair can reach the 0.9 near-dup bar
    assert(bits(cs.nearDupBatch(probe, 0.9)).isEmpty)
    cs.append(Seq((60L, s"${uniq(3, 9)} $boiler")).toDF("doc_id", "text"))
    val after = cs.nearDupBatch(probe, 0.9)
    assert(historyWindows(after, dir) == 0,
      "post-append batch not served from the rebuilt tier")
    assert(bits(after).map(p => (p._1, p._2)) == Set((200L, 60L)),
      "appended doc not visible to the incremental route")
    // crash window: decertify + append land, the rebuild does not —
    // the next open must rebuild (marker absent), not serve stale
    val ok = new java.io.File(
      Dedup.incrementalIndexPath(dir).stripPrefix("file:"), "_ok")
    assert(ok.delete())
    Seq((61L, s"${uniq(4, 9)} $boiler")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Dedup.clearIncrementalCaches()
    val cs2 = CorpusStore.open(spark, dir, thresholds = Seq(0.5, 0.9))
    assert(ok.exists(), "open did not rebuild after a crashed append")
    val probe2 = Seq((201L, s"${uniq(4, 9)} $boiler")).toDF("doc_id", "text")
    assert(bits(cs2.nearDupBatch(probe2, 0.9)).map(p => (p._1, p._2))
      == Set((201L, 61L)), "healed tier missed the crashed append's doc")
  }

  test("compact() bounds corpus fragmentation, refreshes the tier, " +
      "and the docs-count guard alone (belt-and-braces for out-of-band " +
      "rewrites) also forces a rebuild") {
    val dir = Files.createTempDirectory("corpus-store-cmp").toString
    writeCorpus(dir)
    val cs = CorpusStore.open(spark, dir, thresholds = Seq(0.5))
    (0 until 5).foreach { k =>
      cs.append(Seq((70L + k, uniq(k, 5))).toDF("doc_id", "text"))
    }
    def files() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val fragmented = files()
    val before = bits(cs.containmentBatch(freshBatch, 0.5))
    cs.compact()
    assert(files() < fragmented,
      s"compaction did not bound the corpus: $fragmented -> ${files()}")
    assert(bits(cs.containmentBatch(freshBatch, 0.5)) == before,
      "rows diverged across corpus compaction")
    // out-of-band rewrite with a LEFTOVER _ok (the r15 advisor hole):
    // rewrite the corpus behind the store's back, keep the marker —
    // a fresh open's docs-count guard must refuse the stale artifacts
    val idxDir = new java.io.File(dir, "_dedup_index")
    val savedIdx = new java.io.File(dir + "_savedidx")
    assert(idxDir.renameTo(savedIdx), "fixture: index move-aside failed")
    (0 until 49).map { i =>
      (i.toLong, if (i < 40) s"${uniq(i, 1)} $boiler" else uniq(i, 1))
    }.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    assert(savedIdx.renameTo(idxDir), "fixture: index move-back failed")
    spark.catalog.refreshByPath(dir)
    Dedup.clearIncrementalCaches()
    val ok = new java.io.File(
      Dedup.incrementalIndexPath(dir).stripPrefix("file:"), "_ok")
    val staleAt = ok.lastModified()
    val cs2 = CorpusStore.open(spark, dir, thresholds = Seq(0.5))
    assert(ok.lastModified() != staleAt,
      "open trusted a stale _ok over a rewritten corpus")
    assert(bits(cs2.containmentBatch(freshBatch, 0.5)).nonEmpty)
  }
}

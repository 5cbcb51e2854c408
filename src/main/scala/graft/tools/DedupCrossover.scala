package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Measured d2-exact vs d3-LSH crossover (SCALE.md §7).
  *
  * The exact inverted-index join's work is Σ_s df(s)² (df = docs per
  * shingle) — superlinear whenever shingles are SHARED across docs —
  * while the banded LSH path's work is bands×N banding volume plus
  * the (verified) candidate set. This tool measures both LIVE paths,
  * plus those two diverging statistics, at:
  *   - the natural corpora (sf0.01, sf0.1 — 10× docs), and
  *   - a duplication-dense probe (corpus ∪ exact copy, ids shifted):
  *     df doubles for every shingle, so Σdf² quadruples while the
  *     banding volume merely doubles — the regime that separates the
  *     two asymptotics regardless of corpus size.
  *
  * {{{ runMain graft.tools.DedupCrossover }}}
  */
object DedupCrossover {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    def probe(label: String, docs0: DataFrame): Unit = {
      val docs = docs0.select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      // the diverging statistics, from the SAME shingle sets both
      // paths consume
      val sets = Dedup.shingleSetsCached(docs, 3)
      val post = sets.select(col("id"), explode(col("hs")).as("s"))
      val fanout = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * col("df"))).collect()(0).getLong(0)
      val bandVolume = nDocs * 64
      // warm once (fixture caches, codegen), then median of three
      time(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
      time(Dedup.minhashLshPairs(docs, 3, 0.5).count())
      val d2 = med(Seq.fill(3)(
        time(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())))
      val d3 = med(Seq.fill(3)(
        time(Dedup.minhashLshPairs(docs, 3, 0.5).count())))
      val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).count()
      println(f"$label%-28s docs=$nDocs%6d sum_df2=$fanout%12d " +
        f"band_rows=$bandVolume%9d pairs=$pairs%6d " +
        f"d2_exact=$d2%6.2fs d3_lsh=$d3%6.2fs ratio=${d3 / d2}%5.2f")
    }

    /** d14-exact vs d15-prefix-filter (r10, SCALE.md §2). The regime
      * that separates them is BOILERPLATE: a shared suffix on every
      * doc gives its pure trigrams df = N (Σdf² += ~4N² for a 6-word
      * suffix) while the rarest-first prefix never admits them —
      * d14's join pays the N² term, d15's candidates stay at the
      * rare-shingle sub-index. (Suffix sized so no unrelated pair
      * crosses the 0.6 threshold: 4-6 shared shingles / ≥14 min-side
      * shingles ≈ 0.43 max.) */
    def probeContainment(label: String, docs0: DataFrame,
        t: Double = 0.6, draws: Int = 3): Unit = {
      val docs = docs0.select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      val sets = Dedup.shingleSetsCached(docs, 3)
      val post = sets.select(col("id"), explode(col("hs")).as("s"))
      val fanout = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * col("df"))).collect()(0).getLong(0)
      time(Dedup.containmentPairs(docs, 3, t).count())
      time(Dedup.containmentPrefixPairs(docs, 3, t).count())
      val d14 = med(Seq.fill(draws)(
        time(Dedup.containmentPairs(docs, 3, t).count())))
      val d15 = med(Seq.fill(draws)(
        time(Dedup.containmentPrefixPairs(docs, 3, t).count())))
      val pairs = Dedup.containmentPairs(docs, 3, t).count()
      println(f"$label%-28s docs=$nDocs%6d t=$t%.1f sum_df2=$fanout%12d " +
        f"pairs=$pairs%6d d14_exact=$d14%6.2fs d15_prefix=$d15%6.2fs " +
        f"ratio=${d15 / d14}%5.2f")
    }

    val sf001 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sf01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def dense(base: DataFrame, copies: Int): DataFrame =
      (0 until copies).map(k =>
        base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          col("text"))).reduce(_ unionByName _)
    def boiler(base: DataFrame, words: Int = 6): DataFrame =
      base.select(col("doc_id"),
        concat(col("text"),
          lit((1 to words).map("bp" + _).mkString(" ", " ", ""))).as("text"))
    if (args.headOption.contains("containment")) {
      probeContainment("sf0.01", sf001)
      probeContainment("sf0.1", sf01)
      probeContainment("sf0.1 boilerplate", boiler(sf01))
      probeContainment("sf0.1 x2 boilerplate", boiler(dense(sf01, 2)))
      // the FLIP row: 30-word shared suffix (28 pure trigrams, each
      // df = N) at t=0.9 (min-side ≥ 36 shingles, ≤ 32 shared across
      // unrelated pairs → below threshold): d14's join pays
      // 28·N² ≈ 2.8e9 rows while d15's prefix (⌊0.1·nsh⌋+1
      // rarest-first) admits no boilerplate shingle at all
      probeContainment("sf0.1 x2 bp30 t=0.9",
        boiler(dense(sf01, 2), 30), t = 0.9, draws = 1)
    } else {
      probe("sf0.01", sf001)
      probe("sf0.1", sf01)
      probe("sf0.1 x2 dup-dense", dense(sf01, 2))
      probe("sf0.1 x4 dup-dense", dense(sf01, 4))
      probe("sf0.1 x8 dup-dense", dense(sf01, 8))
    }
    spark.stop()
  }
}

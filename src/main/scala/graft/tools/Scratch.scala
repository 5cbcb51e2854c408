package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.cache().count()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
    }

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val planted = Similarity.withPlantedDupes(emb)
      t("planted_count") { planted.count() }
      t("prep_count") { Similarity.prepCached(planted, "vec_id", "embedding").count() }
      val p = Similarity.prepCached(planted, "vec_id", "embedding")
      val sigU = Similarity.sigUdfFor(64, 64, 7L)
      val sigged = p.select(col("id"), sigU(col("v")).as("sig"))
      t("sigged_count") { sigged.count() }
      val mask = (1L << 8) - 1
      val bandArr = array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), 8 * b).bitwiseAND(lit(mask)).as("bkey"))
      }: _*)
      val buckets = sigged.select(col("id"), explode(bandArr).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      t("buckets_count") { buckets.count() }
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("ia"), col("b.id").as("ib"))
      t("sig_xor") { sigged.agg(bit_xor(col("sig"))).head() }
      t("bkey_xor") { buckets.agg(bit_xor(col("bkey"))).head() }
      t("cand_count") { cand.count() }
      val bc = buckets.cache()
      t("buckets_cache") { bc.count() }
      t("cand_count_cached_buckets") {
        bc.as("a").join(bc.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("ia"), col("b.id").as("ib")).count()
      }
      bc.unpersist()
      t("cand_distinct_count") { cand.distinct().count() }
      t("d7_full") {
        Similarity.lshCosinePairs(planted, 0.9, dim = 64, nBits = 64, bands = 8)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Similarity, TextOps}

/** Stage-level profiling harness for the LLM-pipeline operators (not
  * part of the driver contract): times each dedup/similarity stage
  * twice (cold, then warm) against the given sf directory. */
object ProfileLlm {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.maxFields", 256)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    docs.cache().count(); emb.cache().count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("shingles_explode") {
        Dedup.shinglePostings(docs, 3, "doc_id", "text")
          .select(xxhash64(col("s")).as("h"))
      }
      time("minhash_sigs") {
        Dedup.shinglePostings(docs, 3, "doc_id", "text")
          .select(col("id"), xxhash64(col("s")).as("h"))
          .groupBy(col("id"))
          .agg(sort_array(collect_set(col("h"))).as("hs"))
          .select(col("id"), Dedup.minhashSignature(192)(col("hs")).as("sig"))
      }
      time("d2_full") { Dedup.ngramJaccardPairsCached(docs, 3, 0.5) }
      time("d3_full") { Dedup.minhashLshPairs(docs, 3, 0.5) }
      time("d5_brute") { Similarity.brutePairs(emb, 0.45, dim = 64) }
      time("d6_clusters") {
        Dedup.dupClusters(docs,
          Dedup.ngramJaccardPairsCached(docs, 3, 0.5).select(col("ia"), col("ib")))
      }
      time("d7_embed_lsh") {
        Similarity.lshCosinePairs(Similarity.withPlantedDupes(emb), 0.9,
          dim = 64, nBits = 64, bands = 8)
      }
      time("d8_embed_blocked") {
        Similarity.clusterBlockedPairs(Similarity.withPlantedDupes(emb), 0.9,
          dim = 64, nprobe = 2)
      }
      time("d7_deep_r16b16") {
        Similarity.lshCosinePairs(Similarity.withPlantedDupes(emb), 0.9,
          dim = 64, nBits = 256, bands = 16)
      }
      time("d10_substr_spans") { Dedup.substringDupSpans(docs, 8) }
      time("d11_substr_cut") { Dedup.cutDupSpans(docs, 8) }
      time("x1_topk") {
        Similarity.topK(emb.filter(col("vec_id") < 10), emb, 5)
      }
      time("x2_ann") {
        Similarity.annTopK(emb.filter(col("vec_id") < 10), emb, 5, dim = 64)
      }
      time("x3_ivf") {
        Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, 5, dim = 64)
      }
      time("x5_pq") {
        Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb, 5, dim = 64)
      }
    }
    spark.stop()
  }
}

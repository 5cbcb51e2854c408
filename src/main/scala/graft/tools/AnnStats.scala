package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{AnnWitness, Similarity}

/** Prints the raw ANN-vs-exact stats at a given SF dir — used to pick
  * witness thresholds with margin. Not a contract surface. */
object AnnStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"n_emb=${emb.count()}")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.topK(q, emb, 5)
    println("x2 ann: " + AnnWitness.rawTopkStats(
      Similarity.annTopK(q, emb, 5, dim = 64), exact))
    println("x3 ivf: " + AnnWitness.rawTopkStats(
      Similarity.ivfTopK(q, emb, 5, dim = 64), exact))
    println("x5 pq:  " + AnnWitness.rawTopkStats(
      Similarity.pqTopK(q, emb, 5, dim = 64), exact))
    val planted = Similarity.withPlantedDupes(emb)
    val exactPairs = Similarity.brutePairs(planted, 0.9, dim = 64)
    println("d7 lsh: " + AnnWitness.rawPairStats(
      Similarity.lshCosinePairs(planted, 0.9, dim = 64, nBits = 64, bands = 8),
      exactPairs))
    println("d8 blk: " + AnnWitness.rawPairStats(
      Similarity.clusterBlockedPairs(planted, 0.9, dim = 64, nprobe = 2),
      exactPairs))
    spark.stop()
  }
}

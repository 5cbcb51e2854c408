package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: A/B the r13
  * native StringPolyHash fingerprint against the legacy HOF pipeline
  * at corpus volume. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf0.1x100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val mod = graft.llm.TextOps.FingerprintMod
    def legacy(): Unit = docs.select(col("doc_id"),
      aggregate(
        expr("transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))")
          .cast("array<bigint>"),
        lit(0L), (acc, c) => (acc * 31 + c) % mod).as("fp"))
      .agg(sum(col("fp").cast("double"))).collect()
    def native(): Unit = docs.select(col("doc_id"),
      graft.functions.StringPolyHash(col("text"), mod).as("fp"))
      .agg(sum(col("fp").cast("double"))).collect()
    native(); legacy() // warm
    val nT = Seq.fill(3)(time(native())).min
    val lT = Seq.fill(3)(time(legacy())).min
    println(f"docs=${docs.count()} legacy=$lT%.2f s  native=$nT%.2f s")
    spark.stop()
  }
}

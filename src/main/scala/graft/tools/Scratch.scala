package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.Ingest

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: ingest
  * throughput in the reference bench's workload shape
  * (`internal/test/bench/bench.go` — batched remote writes, ≤ 7
  * labels/series), measured through the FULL append path
  * (canonicalize → dedup policy → date+bucket layout → parquet).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val series = 10000 // distinct label sets, 4 labels each
    val edge = spark.range(n).select(
      map(
        lit("__name__"), lit("bench_metric"),
        lit("instance"), concat(lit("inst-"), (col("id") % series).cast("string")),
        lit("job"), concat(lit("job-"), (col("id") % 19).cast("string")),
        lit("zone"), concat(lit("z"), (col("id") % 3).cast("string"))
      ).as("labels"),
      (lit(1704067200000L) + expr(s"id DIV $series") * 1000L).as("t"),
      ((col("id") % 977).cast("double") / 7.0).as("value"))
      .as[Ingest.WriteSample]

    val out = "/tmp/ingest_bench_" + System.nanoTime()
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      Ingest.append(Ingest.canonicalize(edge), s"$out/r$round")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"round $round: $n samples in $sec%.1f s = ${n / sec / 1e6}%.2f M samples/s")
    }
    spark.stop()
  }
}

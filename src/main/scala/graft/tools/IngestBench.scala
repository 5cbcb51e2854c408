package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.Ingest

/** Ingest-throughput measurement against the reference's ≥ 1 M
  * samples/s envelope (`docs/assumptions.md:37-48`, which assumes a
  * 5-node × 24-core cluster; this runs on ONE local JVM). Workload
  * shape mirrors the reference bench generator
  * (`internal/test/bench/bench.go:23,64` + testutil.GenerateDataSamples):
  * 10⁴ unique series of 4 labels each, regular timestamps. Each batch
  * runs the FULL append path — canonicalize → ErrAmendSample dedup
  * policy → date + series-bucket partitioned parquet — into a fresh
  * table dir; batches after the first are warm.
  *
  * Usage: runMain graft.tools.IngestBench [samplesPerBatch] [batches]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val perBatch = args.headOption.map(_.toInt).getOrElse(4_000_000)
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ingest-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nSeries = 10000
    val baseMs = 1704067200000L // 2024-01-01
    for (b <- 0 until batches) {
      val path = java.nio.file.Files
        .createTempDirectory(s"ingest-bench-$b").toString
      // one batch: perBatch samples across nSeries series, 15s cadence,
      // built distributed (the generator must not be the bottleneck)
      val df = spark.range(perBatch).select(
        map(
          lit("__name__"), lit("bench_metric"),
          lit("instance"), concat(lit("inst-"), (col("id") % nSeries)),
          lit("job"), lit("bench"),
          lit("shard"), (col("id") % 4).cast("string")
        ).as("labels"),
        (lit(baseMs) + (col("id") / nSeries).cast("long") * 15000L).as("t"),
        (col("id") % 97).cast("double").as("v"),
        lit(false).as("stale"))
      val t0 = System.nanoTime()
      Ingest.append(df, path) // dedup + sig + date/bucket layout inside
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"batch $b: $perBatch samples in $sec%.2f s = " +
        f"${perBatch / sec / 1e6}%.2f M samples/s${if (b == 0) " (cold)" else ""}")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    }
    spark.stop()
  }
}

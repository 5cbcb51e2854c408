package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Samples
import graft.storage.ChunkStore

/** Measure the chunk tier's compression on a fixture dir: encodes the
  * events table, prints samples, Gorilla payload bytes/sample, parquet
  * file bytes/sample, and the same for a regular-cadence synthetic
  * workload (the reference's bench shape). */
object ChunkStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(p))
    }

    def report(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val out = java.nio.file.Files
        .createTempDirectory("graft-chunkstats").toString
      ChunkStore.write(df, out)
      val (n, bytes, per) = ChunkStore.stats(spark, out)
      val files = dirBytes(out)
      val chunks = ChunkStore.readChunks(spark, out).count()
      println(f"$tag: $n samples, $chunks chunks " +
        f"(avg ${n.toDouble / chunks}%.1f samples/chunk), " +
        f"payload $per%.2f B/sample, parquet ${files.toDouble / n}%.2f B/sample")
    }

    report("events", Samples.fromEventsDir(spark, sfDir))

    import spark.implicits._
    val series = 1000
    val points = 5760 // one day at 15s
    val bench = spark.range(series.toLong * points).select(
      map(lit("__name__"), lit("bench_ctr"),
        lit("instance"), (col("id") % series).cast("string")).as("labels"),
      (lit(1704067200000L) + (col("id") / series).cast("long") * 15000)
        .as("t"),
      ((col("id") / series).cast("long") * 3 + col("id") % series)
        .cast("double").as("v"))
    report("bench-shape counter", bench)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.model.Samples

/** Measures the p8 partials-read path against its raw-samples twin
  * (same daily rollup computed from the events table) — the SCALE.md §6
  * raw-vs-partials ratio. Not a contract surface. */
object PartialsBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med3(f: => Unit): Double = {
      f // warm (for p8 this also builds the partials table)
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    val partials = med3 {
      SparkEntry.queries("p8_bucketed_range")(spark, dir).count()
    }
    val day = 86400000L
    def rollup(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy(col("labels")("event_type").as("event_type"),
        (col("t") - pmod(col("t"), lit(day))).as("t"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("float").as("sum_v"))
      .count()
    // raw twin #1: the memory-CACHED adapter (how the engine's other
    // queries read events — the head-block analogue)
    val rawCached = med3 { rollup(Samples.fromEventsDir(spark, dir)) }
    // raw twin #2: cold parquet, what a query over 100 TB of history
    // actually pays (no cluster caches a month of raw samples)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawDisk = med3 {
      rollup(Samples.fromEvents(spark.read.parquet(s"$dir/events.parquet")))
    }
    val nPart = SparkEntry.queries("p8_bucketed_range")(spark, dir).count()
    val nRaw = spark.read.parquet(s"$dir/events.parquet").count()
    // dense-series twin: partials at (event_type, hour) — the
    // samples-per-bucket >> 1 regime the bucketed design targets
    // (fixture series are sparser than the hourly bucket, so the
    // series-granular partials above compress nothing)
    val denseOut = java.nio.file.Files
      .createTempDirectory("graft-partials-dense").toString
    Samples.fromEvents(spark.read.parquet(s"$dir/events.parquet"))
      .groupBy(col("labels")("event_type").as("event_type"),
        (col("t") - pmod(col("t"), lit(3600000L))).as("bucket_start"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum"))
      .write.mode("overwrite").parquet(denseOut)
    val nDense = spark.read.parquet(denseOut).count()
    val dense = med3 {
      spark.read.parquet(denseOut)
        .withColumn("day",
          col("bucket_start") - pmod(col("bucket_start"), lit(day)))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cnt")).as("n"),
          sum(col("sum")).cast("float").as("sum_v"))
        .count()
    }
    println(f"partials=$partials%.3f raw_cached=$rawCached%.3f " +
      f"raw_disk=$rawDisk%.3f disk_ratio=${rawDisk / partials}%.2f " +
      f"dense=$dense%.3f dense_ratio=${rawDisk / dense}%.2f " +
      s"rows_out=$nPart raw_rows=$nRaw dense_rows=$nDense")
    spark.stop()
  }
}

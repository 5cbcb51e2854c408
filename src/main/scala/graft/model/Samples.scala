package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical sample model of the engine.
  *
  * Mirrors the reference's one logical table — a labelled time series of
  * `(timestamp int64 ms, value float64)` points (reference:
  * `vendor/github.com/prometheus/prometheus/promql/value.go:93-114`,
  * `storage/interface.go:74-83`):
  *
  * {{{
  *   labels MAP<STRING,STRING>   -- full label set incl. __name__
  *   t      BIGINT               -- epoch millis UTC
  *   v      DOUBLE               -- may be NaN; StaleNaN = 0x7ff0000000000002
  * }}}
  *
  * Series identity in the reference is xxhash64 over the name-sorted label
  * pairs (`pkg/labels/labels.go:85-96`). Here the canonical signature is a
  * deterministic string built from the sorted `map_entries` — string (not
  * hash) so it is collision-free and directly groupable/joinable; Spark
  * hashes it internally for shuffle partitioning anyway.
  */
object Samples {
  val MetricNameLabel = "__name__"

  /** Field separators for the canonical signature string; mirror the
    * `\xff` separator idea of labels.Hash (labels/labels.go:85-96). */
  private val kvSep = "ÿ"
  private val pairSep = "þ"

  val schema: StructType = StructType(Seq(
    StructField("labels", MapType(StringType, StringType), nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)
  ))

  /** Canonical series signature over ALL labels (sorted). */
  def sigExpr(labels: Column): Column =
    array_join(
      transform(array_sort(map_entries(labels)),
        e => concat_ws(kvSep, e.getField("key"), e.getField("value"))),
      pairSep)

  /** Signature restricted TO the given label names (PromQL `on(...)` /
    * `by(...)`). */
  def sigOn(labels: Column, names: Seq[String]): Column =
    sigExpr(map_filter(labels, (k, _) => k.isInCollection(names.toSet)))

  /** Signature over all labels EXCEPT the given names and `__name__`
    * (PromQL `ignoring(...)` / `without(...)`). */
  def sigWithout(labels: Column, names: Seq[String]): Column =
    sigExpr(labelsWithout(labels, names))

  def labelsOn(labels: Column, names: Seq[String]): Column =
    if (names.isEmpty) map()
    else map_filter(labels, (k, _) => k.isInCollection(names.toSet))

  def labelsWithout(labels: Column, names: Seq[String]): Column =
    map_filter(labels, (k, _) =>
      !k.isInCollection(names.toSet + MetricNameLabel))

  def dropMetricName(labels: Column): Column =
    map_filter(labels, (k, _) => k =!= MetricNameLabel)

  /** Prometheus staleness marker: a specific signalling-NaN bit pattern
    * (reference `pkg/value/value.go:20-34`). `isnan` is NOT sufficient —
    * normal NaNs are legal sample values. */
  val StaleNaNBits: Long = 0x7ff0000000000002L
  val StaleNaN: Double = java.lang.Double.longBitsToDouble(StaleNaNBits)

  private val isStaleUdf = udf { v: Double =>
    java.lang.Double.doubleToRawLongBits(v) == StaleNaNBits
  }
  def isStale(v: Column): Column = isStaleUdf(v)

  /** Adapter: driver test table `events` → canonical samples.
    * Series labels: metric name + event_type + user_id. */
  def fromEvents(events: DataFrame): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS): read as LongType nanos under
    // spark.sql.legacy.parquet.nanosAsLong (Spark has no nanos timestamp)
    val tMs = events.schema("ts").dataType match {
      case LongType => (col("ts") / 1000000L).cast(LongType)
      case _ => unix_millis(col("ts"))
    }
    events.select(
      map(
        lit(MetricNameLabel), lit("events_value"),
        lit("event_type"), col("event_type"),
        lit("user_id"), col("user_id").cast(StringType)
      ).as("labels"),
      tMs.as("t"),
      col("value").as("v"))
  }

  def fromEventsDir(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fromEvents(spark.read.parquet(s"$sfDir/events.parquet"))
  }
}

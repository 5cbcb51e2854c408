package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.exec.PromQLEngine
import graft.model.Samples
import graft.storage.ChunkStore

/** The chunk-tier read path must prune BEFORE decode: engine time
  * bounds land on the DECODED `t` (a generator output Catalyst cannot
  * push through the Generate), and [[ChunkEnvelopePushdown]] rewrites
  * them into `min_t`/`max_t` envelope predicates plus `date`
  * partition bounds on the chunk table — at 100 TB the difference
  * between decoding two days of blobs and decoding a year. */
class ChunkEnvelopePushdownSpec extends SparkTestBase {

  private val m = 60000L
  private val day = 86400000L
  private val t0 = 1704067200000L // 2024-01-01T00:00Z

  // three days of minute-cadence samples, two series
  private lazy val fixture = samplesDF(
    Map("__name__" -> "cm", "s" -> "a") ->
      (0 until 3 * 1440).map(i => (t0 + i * m, i.toDouble)),
    Map("__name__" -> "cm", "s" -> "b") ->
      (0 until 3 * 1440).map(i => (t0 + i * m, 2.0 * i)))

  private def chunkDir(): String = {
    val dir = Files.createTempDirectory("graft-envelope").toString
    ChunkStore.write(fixture, dir, maxPerChunk = 120)
    dir
  }

  private def bits(df: org.apache.spark.sql.DataFrame) = df
    .select(Samples.sigStr(col("labels")).as("k"), col("t"), col("v"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2))))
    .toSet

  test("engine time bounds become envelope + date filters on the " +
      "chunk scan (pruning before decode), results bit-equal to raw") {
    val dir = chunkDir()
    val chunked = new PromQLEngine(spark, fixture,
      chunkTier = Some(ChunkStore.read(spark, dir)))
    val raw = new PromQLEngine(spark, fixture)
    // a one-hour query in the MIDDLE day
    val qs = t0 + day + 600 * m
    val qe = qs + 60 * m
    val a = raw.rangeQuery("sum_over_time(cm[10m])", qs, qe, 5 * m)
    val b = chunked.rangeQuery("sum_over_time(cm[10m])", qs, qe, 5 * m)
    assert(bits(a) == bits(b), "chunk-served query diverged from raw")
    assert(bits(b).nonEmpty)
    val plan = b.queryExecution.executedPlan.toString
    // envelope comparisons reached the parquet scan as pushed filters
    assert(plan.contains("GreaterThanOrEqual(max_t") &&
      plan.contains("LessThanOrEqual(min_t"),
      s"envelope filters not pushed to the chunk scan:\n$plan")
    // the date bounds prune whole partitions: days 1 and 3 never read
    assert(plan.contains("PartitionFilters") && plan.contains("date"),
      s"date partition filters missing:\n$plan")
    // route observability: every selector scan counted as chunk-served
    assert(chunked.routeHits.containsKey("chunk_tier"),
      "chunk_tier route counter missing")
  }

  test("the rewrite keeps the exact t-range trim (chunk-boundary " +
      "overhang is still filtered) and instant queries stay correct") {
    val dir = chunkDir()
    val chunked = new PromQLEngine(spark, fixture,
      chunkTier = Some(ChunkStore.read(spark, dir)))
    val raw = new PromQLEngine(spark, fixture)
    // bound deliberately mid-chunk: decode returns the whole blob, the
    // original t-filter must trim rows outside [qs-w, qe]
    val ts = t0 + day + 607 * m + 30000L
    assert(bits(raw.instant("count_over_time(cm[7m])", ts)) ==
      bits(chunked.instant("count_over_time(cm[7m])", ts)))
    assert(bits(raw.instant("cm", ts)) == bits(chunked.instant("cm", ts)))
  }

  test("unbounded surfaces (series, label values) and queries without " +
      "literal bounds still work over a chunk tier") {
    val dir = chunkDir()
    val chunked = new PromQLEngine(spark, fixture,
      chunkTier = Some(ChunkStore.read(spark, dir)))
    assert(chunked.series("cm").size == 2)
    assert(chunked.labelValues("s").toSet == Set("a", "b"))
    assert(chunked.rawSamples("cm").count() === fixture.count())
  }

  test("the rule is a no-op on plans without a chunk decode") {
    val raw = new PromQLEngine(spark, fixture)
    val qs = t0 + day + 600 * m
    val a = raw.rangeQuery("cm", qs, qs + 30 * m, 5 * m)
    assert(bits(a).nonEmpty) // plan builds and runs with the rule installed
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.exec.PromQLEngine
import graft.model.Samples
import graft.storage.Ingest

/** The series-bucketed storage tier (Ingest.writeBucketedStore):
  * correctness — the store is a LAYOUT change, every query result must
  * be byte-identical to the plain-samples path — and the plan shape it
  * exists for: per-series groupings read their distribution from the
  * bucketed scan, so the sample-volume exchange disappears.
  */
class BucketedStoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val T0 = 1704067200000L
  private val DAY = 86400000L

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  // Read the fixture DIRECTLY (no Samples.fromEventsDir): that helper
  // Spark-caches the adapter frame, and the CacheManager would then
  // substitute the InMemoryRelation into OTHER suites' uncached reads
  // of the same parquet — PlanShapeSpec's pushdown test asserts on the
  // raw scan's PushedFilters and must keep seeing a parquet scan.
  private lazy val plain: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Samples.fromEvents(spark.read.parquet(s"$sf/events.parquet"))
      .withColumn("stale", lit(false))
  }

  private lazy val store: DataFrame = {
    val table = "graft_store_spec_" +
      java.lang.Long.toHexString(System.nanoTime())
    val path = java.nio.file.Files
      .createTempDirectory("graft-store-spec").toString
    Ingest.writeBucketedStore(plain, table, path, buckets = 8)
    Ingest.readBucketedStore(spark, table)
  }

  private lazy val plainEng = new PromQLEngine(spark, plain)
  private lazy val storeEng = new PromQLEngine(spark, store)

  private def results(df: DataFrame): Set[(String, Long, Double)] =
    df.collect().map { r =>
      (r.getMap[String, String](r.fieldIndex("labels")).toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(","),
        r.getLong(r.fieldIndex("t")),
        r.getDouble(r.fieldIndex("v")))
    }.toSet

  test("stored sig equals the engine's computed sig for every row") {
    val bad = store
      .filter(col("sig") =!= Samples.sigExpr(col("labels"))).count()
    assert(bad == 0, s"$bad rows with sig != sigExpr(labels)")
  }

  test("range fold over the store matches the plain path exactly") {
    val q = "sum_over_time(events_value[1d])"
    val a = results(plainEng.rangeQuery(q, T0 + DAY, T0 + 29 * DAY, DAY))
    val b = results(storeEng.rangeQuery(q, T0 + DAY, T0 + 29 * DAY, DAY))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("instant selector over the store matches the plain path (both grids)") {
    // coarse grid: general vectorSelect; fine grid: bucketedSelect
    for ((end, step) <- Seq((T0 + 29 * DAY, DAY),
        (T0 + DAY + 6 * 3600000L, 60000L))) {
      val a = results(plainEng.rangeQuery("events_value", T0 + DAY, end, step))
      val b = results(storeEng.rangeQuery("events_value", T0 + DAY, end, step))
      assert(a == b, s"mismatch at step=$step")
    }
  }

  test("rate over the store matches the plain path") {
    val q = "rate(events_value[2d])"
    val a = results(plainEng.rangeQuery(q, T0 + 2 * DAY, T0 + 29 * DAY, DAY))
    val b = results(storeEng.rangeQuery(q, T0 + 2 * DAY, T0 + 29 * DAY, DAY))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("per-series aggregation over the store plans ZERO exchanges") {
    // the 100 TB claim, asserted literally: grouping on (sig, bucket)
    // is satisfied by the scan's HashPartitioning(sig, n) — no shuffle
    // of any kind, broadcast included
    val agg = store
      .filter(!col("stale") && col("t") >= T0 && col("t") < T0 + 7 * DAY)
      .groupBy(col("sig"), expr(s"t DIV $DAY").as("b"))
      .agg(sum(col("v")), org.apache.spark.sql.functions.count(lit(1)),
        min(col("v")), max(col("v")))
    val p = formatted(agg)
    assert(!p.contains("Exchange"),
      s"bucketed per-series aggregation must not shuffle:\n$p")
  }

  test("compaction restores one file per bucket and keeps the bucket contract") {
    val table = "graft_compact_spec_" +
      java.lang.Long.toHexString(System.nanoTime())
    val dir = java.nio.file.Files
      .createTempDirectory("graft-compact-spec").toString
    def batch(off: Int) = samplesDF(
      (0 until 6).map(i => Map("__name__" -> "m", "i" -> i.toString) ->
        Seq((off * 1000L, off * 1.0 + i), (off * 1000L + 500, off + 0.5))): _*)
    Ingest.writeBucketedStore(batch(1), table, dir, buckets = 4)
    Ingest.writeBucketedStore(batch(2), table, dir, buckets = 4)
    def rows: Set[(Long, Long, Double)] = spark.table(table)
      .select(col("sig"), col("t"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def files: Seq[String] = {
      val d = new java.io.File(s"$dir/date=1970-01-01")
      d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSeq
    }
    val before = rows
    assert(files.size > 4, s"two appends should fragment: ${files.size} files")
    Ingest.compactBucketedStore(spark, table, "1970-01-01")
    assert(rows == before, "compaction must not change the data")
    assert(files.size <= 4, s"compaction must restore ≤1 file/bucket: $files")
    // the files must still be bucket-assigned: a shuffle-free per-sig
    // aggregation (valid only under the bucket contract) must yield
    // exactly one output row per series — a file in the wrong bucket
    // would split its group across partitions and duplicate rows here
    val agg = spark.table(table).groupBy(col("sig"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    assert(!formatted(agg).contains("Exchange"))
    val sigs = agg.collect().map(_.getLong(0))
    assert(sigs.length == sigs.distinct.length,
      "split groups: compacted files lost their bucket assignment")
    assert(sigs.length == before.map(_._1).size &&
      sigs.toSet == before.map(_._1))
  }

  test("engine range query over the store drops the sample-volume shuffle") {
    // comparative: the SAME engine query plans strictly fewer hash
    // exchanges over the store (the windowed (sig, step) fold reads its
    // distribution from the scan); remaining exchanges touch only
    // already-reduced or dimension-sized frames
    val q = "count_over_time(events_value[1d])"
    // formatted mode prints shuffle nodes as "(N) Exchange" (broadcast
    // ones as "(N) BroadcastExchange" — excluded by the ") " match)
    def hashExchanges(e: PromQLEngine): Int =
      count(formatted(e.rangeQuery(q, T0 + DAY, T0 + 29 * DAY, DAY)),
        ") Exchange")
    val plainN = hashExchanges(plainEng)
    val storeN = hashExchanges(storeEng)
    assert(storeN < plainN,
      s"store plan must shed the sample shuffle: store=$storeN plain=$plainN")
  }
}

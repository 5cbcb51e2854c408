package graft.api

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.exec.PromQLEngine
import graft.storage.Ingest

/** The live-write deployment must serve the SAME accelerated plans as
  * the read-only `Serve` modes: after every `/write`,
  * [[HttpApi.forTable]] upserts the series index and refreshes the
  * fold-partials rungs for the touched dates, then swaps in an engine
  * bound to both tiers — the analogue of the reference TSDB keeping
  * its head inverted index live during appends (`tsdb/head.go`,
  * `tsdb/index/postings.go:267-418`). */
class ForTableTiersSpec extends SparkTestBase {

  private val m = 60000L

  private def bits(e: PromQLEngine, q: String,
      start: Long, end: Long, step: Long) =
    e.rangeQuery(q, start, end, step)
      .select(col("labels")("k").as("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2))))
      .toSet

  test("forTable binds the series index and partials rungs, and a " +
      "write refreshes both before the engine swap") {
    val path = Files.createTempDirectory("api-table-tiers").toString
    val tApi = HttpApi.forTable(spark, path, rollups = Seq(5 * m))
    tApi.start()
    try {
      def postT(p: String, body: String): Int = {
        val url = new URI(s"http://127.0.0.1:${tApi.boundPort}$p").toURL
        val conn = url.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes(UTF_8))
        conn.getResponseCode
      }
      // a counter with resets at 30s cadence across 2h — resets make
      // the p9 rate route's correction columns load-bearing
      val lines1 = (0 to 240).map(i =>
        s"""{"labels":{"__name__":"live_m","k":"a"},"t":${i * 30000L},"v":${(i * 7) % 100}}""")
        .mkString("\n")
      assert(postT("/api/v1/write", lines1) == 200)

      // the swapped-in engine carries both tiers
      val e1 = tApi.servingEngine
      assert(e1.hasSeriesIndex, "swapped engine lost the series index")
      assert(e1.allPartials.map(_._2) == Seq(5 * m),
        "swapped engine lost the partials rung")

      // s13 routing proof: the matcher resolves from the on-disk index
      // ALONE — an engine whose samples table is EMPTY still answers
      // series() because the unbounded path is index-only
      val idx = spark.read.parquet(s"$path/_index")
      val idxOnly = new PromQLEngine(spark, samplesDF(),
        seriesIndex = Some(idx))
      assert(idxOnly.series("""live_m{k="a"}""").nonEmpty,
        "matcher did not resolve via the index")

      // p9 routing proof (inverse witness, as PartialsRoutingSpec):
      // same samples but an EMPTY rung at the same bucket size → the
      // aligned rate returns NOTHING, so with the real rung bound the
      // rows can only be coming from the rung, not the raw path.
      // (A rung-only probe over empty samples cannot work — the
      // materialized routes join labels back through the samples-
      // derived series dimension.)
      val tableSamples = Ingest.readTable(spark, path)
      val emptyRung = Ingest.foldPartials(
        tableSamples.filter(lit(false)), 5 * m)
      val starved = new PromQLEngine(spark, tableSamples,
        partialsLadder = Seq((emptyRung, 5 * m)))
      assert(starved
        .rangeQuery("rate(live_m[10m])", 20 * m, 115 * m, 5 * m)
        .count() == 0, "aligned rate did not route to the rung")

      // ...and the served engine's routed results are bit-equal to a
      // raw-path engine over the same table
      val raw1 = new PromQLEngine(spark, Ingest.readTable(spark, path))
      for (q <- Seq("rate(live_m[10m])", "sum_over_time(live_m[10m])",
          "irate(live_m[10m])")) {
        val a = bits(raw1, q, 20 * m, 115 * m, 5 * m)
        val b = bits(e1, q, 20 * m, 115 * m, 5 * m)
        assert(a == b, s"$q diverged between raw and served engines")
        assert(a.nonEmpty)
      }

      // second write into the SAME date: the incremental refresh must
      // rewrite that date's partials partition — the routed query now
      // covers the new points and stays bit-equal to raw
      val lines2 = (241 to 280).map(i =>
        s"""{"labels":{"__name__":"live_m","k":"a"},"t":${i * 30000L},"v":${(i * 7) % 100}}""")
        .mkString("\n")
      assert(postT("/api/v1/write", lines2) == 200)
      val e2 = tApi.servingEngine
      val raw2 = new PromQLEngine(spark, Ingest.readTable(spark, path))
      val a2 = bits(raw2, "rate(live_m[10m])", 20 * m, 135 * m, 5 * m)
      val b2 = bits(e2, "rate(live_m[10m])", 20 * m, 135 * m, 5 * m)
      assert(a2 == b2, "post-refresh rate diverged between raw and served")
      // the extension past 2h only exists in the second write
      assert(a2.exists(_._2 > 120 * m),
        "refresh did not pick up the second write's points")

      // the serving engine's route counters surface on /metrics — the
      // bits() comparisons above ran rate/sum/irate through the rungs
      val metricsUrl = new URI(
        s"http://127.0.0.1:${tApi.boundPort}/metrics").toURL
      val metrics = new String(
        metricsUrl.openStream().readAllBytes(), UTF_8)
      assert(metrics.contains("graft_engine_route_total{route=\"rate_partials\""),
        s"route counters missing from /metrics:\n$metrics")

      // a new series in the second batch reaches the index incrementally
      assert(postT("/api/v1/write",
        """{"labels":{"__name__":"live_m","k":"b"},"t":0,"v":1}""") == 200)
      val idx2 = spark.read.parquet(s"$path/_index")
      assert(idx2.filter(col("labels")("k") === "b").count() == 1)
      // idempotent: re-writing the same series adds no index row
      assert(postT("/api/v1/write",
        s"""{"labels":{"__name__":"live_m","k":"b"},"t":$m,"v":2}""") == 200)
      assert(spark.read.parquet(s"$path/_index")
        .filter(col("labels")("k") === "b").count() == 1)
    } finally tApi.stop()
  }

  test("the write path auto-compacts the series index past the " +
      "fragmentation threshold") {
    val path = Files.createTempDirectory("api-table-compact").toString
    val tApi = HttpApi.forTable(spark, path, indexCompactThreshold = 3)
    tApi.start()
    try {
      def postT(body: String): Int = {
        val url = new URI(
          s"http://127.0.0.1:${tApi.boundPort}/api/v1/write").toURL
        val conn = url.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes(UTF_8))
        conn.getResponseCode
      }
      def idxFiles: Int = new java.io.File(s"$path/_index").listFiles()
        .count(_.getName.endsWith(".parquet"))
      // each write carries a NOVEL series → one index file per write
      // when uncompacted, so 8 writes would mean exactly 8 files; the
      // threshold-3 compactions must keep growth SUB-linear (the
      // rewritten bucket files fan out by sig, so the exact count
      // depends on hash placement — the invariant is boundedness, not
      // a specific number)
      for (i <- 1 to 8)
        assert(postT(s"""{"labels":{"__name__":"cm","k":"$i"},"t":0,"v":$i}""") == 200)
      assert(idxFiles < 8,
        s"index never compacted: $idxFiles files for 8 single-series writes")
      // the rewrites lost nothing: every series ever written answers
      assert(spark.read.parquet(s"$path/_index").count() == 8)
      assert(tApi.servingEngine.series("cm").size == 8)
    } finally tApi.stop()
  }

  test("a crash between the table append and the tier refresh heals " +
      "at the next startup (the _tiers_ok marker protocol)") {
    import spark.implicits._
    val path = Files.createTempDirectory("api-table-heal").toString
    // a server wrote one healthy batch and stopped
    val tApi = HttpApi.forTable(spark, path, rollups = Seq(5 * m))
    tApi.stop()
    val healthy = (0 to 60).map(i => Ingest.WriteSample(
      Map("__name__" -> "hm", "k" -> "a"), i * m, i.toDouble))
    Ingest.append(Ingest.canonicalize(healthy.toDS()), path)
    spark.catalog.refreshByPath(path)
    Ingest.appendSeriesIndex(Ingest.canonicalize(healthy.toDS()),
      s"$path/_index")
    Ingest.refreshFoldPartials(spark, path,
      Ingest.rollupPath(path, 5 * m), 5 * m)
    // CRASH WINDOW: the sink deletes the marker, appends a batch with
    // a NEW series, and dies before the index upsert / rung refresh
    assert(new java.io.File(s"$path/_tiers_ok").delete() ||
      !new java.io.File(s"$path/_tiers_ok").exists())
    val crashed = (0 to 60).map(i => Ingest.WriteSample(
      Map("__name__" -> "hm", "k" -> "crash"), i * m, 2.0 * i))
    Ingest.append(Ingest.canonicalize(crashed.toDS()), path)
    spark.catalog.refreshByPath(path)
    // restart: the missing marker forces a full tier heal
    val tApi2 = HttpApi.forTable(spark, path, rollups = Seq(5 * m))
    try {
      val e = tApi2.servingEngine
      assert(e.hasSeriesIndex && e.allPartials.nonEmpty)
      // the crashed batch's series is matcher-resolvable via the index
      assert(spark.read.parquet(s"$path/_index")
        .filter(col("labels")("k") === "crash").count() == 1)
      // and the rung-routed query covers its points, bit-equal to raw
      val raw = new PromQLEngine(spark, Ingest.readTable(spark, path))
      def bits2(en: PromQLEngine) =
        en.rangeQuery("sum_over_time(hm[10m])", 20 * m, 55 * m, 5 * m)
          .select(col("labels")("k"), col("t"), col("v")).collect()
          .map(r => (r.getString(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
      val a = bits2(raw); val b = bits2(e)
      assert(a == b, "healed tiers diverged from raw")
      assert(a.exists(_._1 == "crash"),
        "healed index/rung missed the crashed batch's series")
      assert(new java.io.File(s"$path/_tiers_ok").exists(),
        "heal did not restore the freshness marker")
    } finally tApi2.stop()
  }
}

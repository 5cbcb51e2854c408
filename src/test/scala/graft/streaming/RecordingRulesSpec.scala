package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.exec.PromQLEngine
import graft.storage.Ingest
import graft.streaming.RecordingRules.{Group, Rule}

class RecordingRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 60000L
  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def sample(k: String, t: Long, v: Double) =
    Ingest.WriteSample(Map("__name__" -> "mtr", "k" -> k), t, v)
  // integer-valued samples: double addition is exact, so recorded sums
  // are bit-identical however the aggregation order falls
  private def feed(ks: Seq[String], minutes: Range) = ks.flatMap(k =>
    minutes.map(i => sample(k, i * m, (if (k == "b") 2 * i else i).toDouble)))

  private val rule1 =
    Rule("k:mtr:sum5m", "sum by (k) (sum_over_time(mtr[5m]))",
      Map("rule" -> "g1"))
  private val group = Group(5 * m, Seq(rule1))

  private def recorded(path: String) =
    Ingest.readTable(spark, path)
      .filter(col("labels")("__name__") === "k:mtr:sum5m")

  test("rules record renamed series; passes are incremental, idempotent, " +
      "and write staleness markers for disappeared series") {
    val path = tmp("rules")
    Ingest.append(Ingest.canonicalize(feed(Seq("a", "b"), 0 to 14).toDS()), path)
    RecordingRules.evalGroup(spark, path, group)

    // steps 0, 5m, 10m evaluated; labels renamed + rule labels overlaid
    val r1 = recorded(path).collect()
    assert(r1.map(_.getAs[Long]("t")).toSet == Set(0L, 5 * m, 10 * m))
    assert(r1.forall { r =>
      val l = r.getAs[Map[String, String]]("labels")
      l("__name__") == "k:mtr:sum5m" && l("rule") == "g1" && l.contains("k")
    })
    // closed [t-5m, t] window at t=10m: a = 5+...+10, b doubled
    val at10 = r1.filter(_.getAs[Long]("t") == 10 * m)
      .map(r => r.getAs[Map[String, String]]("labels")("k") ->
        r.getAs[Double]("v")).toMap
    assert(at10 == Map("a" -> 45.0, "b" -> 90.0))

    // recorded series are first-class: queryable through the engine
    val eng1 = new PromQLEngine(spark, Ingest.readTable(spark, path))
    val q1 = resultMap(eng1.instant("""k:mtr:sum5m{k="a"}""", 10 * m))
    assert(q1.values.toSeq == Seq(45.0))

    // re-running without new data appends nothing
    RecordingRules.evalGroup(spark, path, group)
    assert(recorded(path).count() == r1.length)

    // catch-up: series a continues to minute 30, series b STOPS at 14
    Ingest.append(Ingest.canonicalize(feed(Seq("a"), 15 to 30).toDS()), path)
    RecordingRules.evalGroup(spark, path, group)
    val r2 = recorded(path)
    // a: real rows at every step through 30m
    assert(r2.filter(col("labels")("k") === "a" && !col("stale"))
      .select(col("t")).as[Long].collect().toSet ==
      (0 to 6).map(_ * 5 * m).toSet)
    // b: present through 15m (its samples at 10..14m are in the 15m
    // window), then exactly ONE marker at 20m — no cascade at 25/30m
    val bRows = r2.filter(col("labels")("k") === "b")
      .select(col("t"), col("stale")).as[(Long, Boolean)].collect().toMap
    assert(bRows == Map(0L -> false, 5 * m -> false, 10 * m -> false,
      15 * m -> false, 20 * m -> true))
    // marker semantics end-to-end: b is gone at 20m, not resurrected
    val eng2 = new PromQLEngine(spark, Ingest.readTable(spark, path))
    assert(eng2.instant("""k:mtr:sum5m{k="b"}""", 20 * m).count() == 0)
    assert(resultMap(eng2.instant("""k:mtr:sum5m{k="b"}""", 15 * m))
      .values.toSeq == Seq(120.0))
  }

  test("rules in a group evaluate sequentially: later rules read " +
      "earlier rules' output of the same pass") {
    val path = tmp("rules-chain")
    val chained = Group(5 * m, Seq(rule1,
      Rule("total:sum5m", "sum(k:mtr:sum5m)")))
    Ingest.append(Ingest.canonicalize(feed(Seq("a", "b"), 0 to 14).toDS()), path)
    RecordingRules.evalGroup(spark, path, chained)
    val eng = new PromQLEngine(spark, Ingest.readTable(spark, path))
    val total = resultMap(eng.instant("total:sum5m", 10 * m))
    assert(total.values.toSeq == Seq(135.0)) // 45 + 90, same pass
  }

  test("streaming ingest evaluates rules per micro-batch, matching " +
      "a batch evaluation of the same data") {
    val path = tmp("rules-stream")
    val ckpt = tmp("rules-stream-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ingest.WriteSample]
    mem.addData(feed(Seq("a", "b"), 0 to 14): _*)
    RecordingRules.stream(mem.toDS(), path, ckpt, group)
      .awaitTermination(120000)
    // second micro-batch continues from the recorded resume point
    mem.addData(feed(Seq("a"), 15 to 30): _*)
    RecordingRules.stream(mem.toDS(), path, ckpt, group)
      .awaitTermination(120000)

    val batchPath = tmp("rules-batch-twin")
    Ingest.append(Ingest.canonicalize(
      feed(Seq("a", "b"), 0 to 14).toDS()), batchPath)
    RecordingRules.evalGroup(spark, batchPath, group)
    Ingest.append(Ingest.canonicalize(feed(Seq("a"), 15 to 30).toDS()), batchPath)
    RecordingRules.evalGroup(spark, batchPath, group)

    def key(path: String) = recorded(path)
      .select(map_entries(col("labels")).cast("string").as("l"),
        col("t"), col("v"), col("stale"))
      .as[(String, Long, Double, Boolean)].collect()
      // markers carry NaN, and NaN != NaN would fail tuple equality —
      // the stale flag already encodes "marker", so blank the value
      .map { case (l, t, v, s) => (l, t, if (s) 0.0 else v, s) }
      .sortBy(r => (r._1, r._2)).toSeq
    assert(key(path) == key(batchPath))
  }
}

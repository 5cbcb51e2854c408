package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.exec.PromQLEngine
import graft.storage.Ingest
import graft.streaming.RecordingRules.{AlertRule, Group, Rule}

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

  test("backfill-window boundary: the first evaluated steps see their " +
      "FULL range windows, not a frame truncated at the window bound") {
    val path = tmp("rules-window")
    // 21 minutes of data; a 1m-interval group capped at 3 backfill
    // steps starts evaluating at hi - 3m = 17m — but the rule's [10m]
    // window at that step reaches back to 7m, far below the bound
    Ingest.append(Ingest.canonicalize(feed(Seq("a"), 0 to 20).toDS()), path)
    val rule = Rule("k:mtr:sum10m", "sum by (k) (sum_over_time(mtr[10m]))")
    RecordingRules.evalGroup(spark, path,
      Group(m, Seq(rule), maxBackfillSteps = 3))
    val rec = Ingest.readTable(spark, path)
      .filter(col("labels")("__name__") === "k:mtr:sum10m")
      .select(col("t"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // closed [7m, 17m] window: 7+8+...+17 — an eval frame truncated at
    // the backfill bound would record 17 here and make it permanent
    assert(rec(17 * m) == (7 to 17).sum.toDouble, s"got $rec")
    assert(rec(20 * m) == (10 to 20).sum.toDouble)
    assert(rec.keySet == Set(17 * m, 18 * m, 19 * m, 20 * m))
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

  private val alertGroup = Group(5 * m, Nil, alerts = Seq(AlertRule(
    "HighSum", "sum by (k) (sum_over_time(mtr[5m])) > 50",
    forMs = 10 * m, labels = Map("severity" -> "page"))))

  private def alertRows(path: String, name: String) =
    Ingest.readTable(spark, path)
      .filter(col("labels")("__name__") === name)
      .select(col("labels")("k").as("k"),
        coalesce(col("labels")("alertstate"), lit("-")).as("st"),
        col("t"), col("v"), col("stale"))
      .as[(String, String, Long, Double, Boolean)].collect()

  test("alerting rules: pending->firing after `for`, state series carry " +
      "activeAt, transitions and resolutions write markers") {
    val path = tmp("alerts")
    // a crosses 50 from 15m on (through 30m); b crosses at 10m and
    // disappears after 15m (its samples stop at minute 14)
    Ingest.append(Ingest.canonicalize(
      (feed(Seq("a", "b"), 0 to 14) ++ feed(Seq("a"), 15 to 30)).toDS()), path)
    RecordingRules.evalGroup(spark, path, alertGroup)

    val al = alertRows(path, "ALERTS")
    // a: pending at 15m/20m (activeAt 15m), firing from 25m; the
    // pending->firing label change writes a marker for the pending
    // series at 25m
    assert(al.filter(r => r._1 == "a" && !r._5).map(r => (r._2, r._3)).toSet ==
      Set(("pending", 15 * m), ("pending", 20 * m),
        ("firing", 25 * m), ("firing", 30 * m)))
    assert(al.filter(r => r._1 == "a" && r._5).map(r => (r._2, r._3)).toSet ==
      Set(("pending", 25 * m)))
    // b: pending at 10m/15m, never fires; resolution at 20m writes
    // markers for BOTH its series
    assert(al.filter(r => r._1 == "b" && !r._5).map(r => (r._2, r._3)).toSet ==
      Set(("pending", 10 * m), ("pending", 15 * m)))
    assert(al.filter(r => r._1 == "b" && r._5).map(r => (r._2, r._3)).toSet ==
      Set(("pending", 20 * m)))
    val fs = alertRows(path, "ALERTS_FOR_STATE")
    assert(fs.filter(r => r._1 == "a" && !r._5).map(r => (r._3, r._4)).toSet ==
      (3 to 6).map(k => (k * 5 * m, 15.0 * m)).toSet)
    assert(fs.filter(r => r._1 == "b" && r._5).map(_._3).toSet == Set(20 * m))

    // ALERTS is a first-class series: rule labels present, engine
    // queries see firing alerts and marker-hidden resolved ones
    val eng = new PromQLEngine(spark, Ingest.readTable(spark, path))
    val firing = resultMap(
      eng.instant("""ALERTS{alertstate="firing",severity="page"}""", 25 * m))
    assert(firing.size == 1 && firing.values.toSeq == Seq(1.0))
    assert(eng.instant("""ALERTS{k="b"}""", 20 * m).count() == 0)
  }

  test("annotation templates expand $labels and $value; unknown labels " +
      "expand empty like a Go template") {
    assert(RecordingRules.expandTemplate(
      "{{ $labels.k }}/{{$value}} {{ $labels.missing }}!",
      Map("k" -> "a"), 1.5) == "a/1.5 !")
    assert(RecordingRules.expandTemplate(
      "no placeholders $value {{ x }}", Map.empty, 0.0) ==
      "no placeholders $value {{ x }}")
  }

  test("alert state restores across passes from ALERTS_FOR_STATE") {
    val split = tmp("alerts-split")
    Ingest.append(Ingest.canonicalize(feed(Seq("a", "b"), 0 to 14).toDS()), split)
    RecordingRules.evalGroup(spark, split, alertGroup)
    Ingest.append(Ingest.canonicalize(feed(Seq("a"), 15 to 30).toDS()), split)
    RecordingRules.evalGroup(spark, split, alertGroup)

    val whole = tmp("alerts-whole")
    Ingest.append(Ingest.canonicalize(
      (feed(Seq("a", "b"), 0 to 14) ++ feed(Seq("a"), 15 to 30)).toDS()), whole)
    RecordingRules.evalGroup(spark, whole, alertGroup)

    def key(p: String) =
      (alertRows(p, "ALERTS") ++ alertRows(p, "ALERTS_FOR_STATE"))
        .map(r => (r._1, r._2, r._3, if (r._5) 0.0 else r._4, r._5))
        .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(key(split) == key(whole))
    // the split run restored b's activeAt=10m from the recorded state
    assert(alertRows(split, "ALERTS_FOR_STATE")
      .filter(r => r._1 == "b" && r._3 == 15 * m && !r._5)
      .map(_._4).toSeq == Seq(10.0 * m))
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

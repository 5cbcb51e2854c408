package graft.exec

import graft.SparkTestBase
import graft.model.Samples

/** Golden evaluation tests. Fixture mirrors the reference API tests'
  * corpus (`internal/api/v1/api_test.go:37-43`):
  *   test_metric1{foo="bar"} 0+100x100   (step 1m)
  *   test_metric1{foo="boo"} 1+0x100
  *   test_metric2{foo="boo"} 1+0x100
  */
class PromQLEngineSpec extends SparkTestBase {

  private val m = 60000L // 1m in ms

  private lazy val fixture = samplesDF(
    Map("__name__" -> "test_metric1", "foo" -> "bar") -> seriesAt(m, 0, 100, 100),
    Map("__name__" -> "test_metric1", "foo" -> "boo") -> seriesAt(m, 1, 0, 100),
    Map("__name__" -> "test_metric2", "foo" -> "boo") -> seriesAt(m, 1, 0, 100))

  private lazy val engine = new PromQLEngine(spark, fixture)

  test("instant selector picks latest point in lookback") {
    val r = resultMap(engine.instant("test_metric1", 2 * m))
    assertApprox(r, Map(
      ("__name__=test_metric1,foo=bar", 2 * m) -> 200.0,
      ("__name__=test_metric1,foo=boo", 2 * m) -> 1.0))
  }

  test("lookback window is 5m, closed at both ends") {
    val r = resultMap(engine.instant("test_metric1", 7 * m))
    assert(r(("__name__=test_metric1,foo=bar", 7 * m)) == 700.0)
    // beyond 5m after the last sample (100m): empty
    val r2 = engine.instant("test_metric1", 106 * m)
    assert(r2.count() == 0)
    // exactly 5m after last sample: still included (t >= ts - 5m)
    val r3 = resultMap(engine.instant("test_metric1", 105 * m))
    assert(r3(("__name__=test_metric1,foo=bar", 105 * m)) == 10000.0)
  }

  test("offset modifier") {
    val r = resultMap(engine.instant("test_metric1 offset 1m", 3 * m))
    assert(r(("__name__=test_metric1,foo=bar", 3 * m)) == 200.0)
  }

  test("scalar literal and arithmetic") {
    val r = resultMap(engine.instant("1 + 1", 0))
    assertApprox(r, Map(("", 0L) -> 2.0))
  }

  test("sum by") {
    val r = resultMap(engine.instant("sum by (foo) (test_metric1)", 2 * m))
    assertApprox(r, Map(
      ("foo=bar", 2 * m) -> 200.0,
      ("foo=boo", 2 * m) -> 1.0))
  }

  test("sum without grouping labels collapses all") {
    val r = resultMap(engine.instant("sum(test_metric1)", 2 * m))
    assertApprox(r, Map(("", 2 * m) -> 201.0))
  }

  test("aggregations: avg min max count stddev quantile") {
    assertApprox(resultMap(engine.instant("avg(test_metric1)", 2 * m)),
      Map(("", 2 * m) -> 100.5))
    assertApprox(resultMap(engine.instant("min(test_metric1)", 2 * m)),
      Map(("", 2 * m) -> 1.0))
    assertApprox(resultMap(engine.instant("max(test_metric1)", 2 * m)),
      Map(("", 2 * m) -> 200.0))
    assertApprox(resultMap(engine.instant("count(test_metric1)", 2 * m)),
      Map(("", 2 * m) -> 2.0))
    // population stddev of {200, 1} = 99.5
    assertApprox(resultMap(engine.instant("stddev(test_metric1)", 2 * m)),
      Map(("", 2 * m) -> 99.5))
    // exact interpolated quantile of {1, 200} at 0.9 → 1 + 0.9*199
    assertApprox(resultMap(engine.instant("quantile(0.9, test_metric1)", 2 * m)),
      Map(("", 2 * m) -> 180.1))
  }

  test("topk keeps original series labels") {
    val r = resultMap(engine.instant("topk(1, test_metric1)", 2 * m))
    assertApprox(r, Map(("__name__=test_metric1,foo=bar", 2 * m) -> 200.0))
    val b = resultMap(engine.instant("bottomk(1, test_metric1)", 2 * m))
    assertApprox(b, Map(("__name__=test_metric1,foo=boo", 2 * m) -> 1.0))
  }

  test("count_values") {
    val r = resultMap(engine.instant("""count_values("val", test_metric2)""", 2 * m))
    assertApprox(r, Map(("val=1", 2 * m) -> 1.0))
  }

  test("vector-scalar arithmetic drops metric name") {
    val r = resultMap(engine.instant("test_metric1 * 2", 2 * m))
    assertApprox(r, Map(
      ("foo=bar", 2 * m) -> 400.0,
      ("foo=boo", 2 * m) -> 2.0))
  }

  test("vector-scalar comparison filters, keeps name") {
    val r = resultMap(engine.instant("test_metric1 > 100", 2 * m))
    assertApprox(r, Map(("__name__=test_metric1,foo=bar", 2 * m) -> 200.0))
    // bool keeps the name too in this vintage: shouldDropMetricName
    // (engine.go:1460-1467) lists only + - * / %, and VectorscalarBinop
    // never consults returnBool for the metric
    val b = resultMap(engine.instant("test_metric1 > bool 100", 2 * m))
    assertApprox(b, Map(
      ("__name__=test_metric1,foo=bar", 2 * m) -> 1.0,
      ("__name__=test_metric1,foo=boo", 2 * m) -> 0.0))
  }

  test("vector-vector one-to-one matching (ignoring name)") {
    // test_metric1{foo="boo"} + test_metric2{foo="boo"} matches on {foo}
    val r = resultMap(engine.instant("test_metric1 + test_metric2", 2 * m))
    assertApprox(r, Map(("foo=boo", 2 * m) -> 2.0))
  }

  test("vector-vector with on()") {
    val r = resultMap(engine.instant(
      "test_metric1 * on(foo) test_metric2", 2 * m))
    assertApprox(r, Map(("foo=boo", 2 * m) -> 1.0))
  }

  test("set operations and/or/unless") {
    val and = resultMap(engine.instant("test_metric1 and test_metric2", 2 * m))
    assertApprox(and, Map(("__name__=test_metric1,foo=boo", 2 * m) -> 1.0))
    val unless = resultMap(engine.instant("test_metric1 unless test_metric2", 2 * m))
    assertApprox(unless, Map(("__name__=test_metric1,foo=bar", 2 * m) -> 200.0))
    // test_metric2{foo="boo"}'s signature (ignoring __name__) already
    // exists in lhs → dropped (engine.go:917-937)
    val or = resultMap(engine.instant("test_metric1 or test_metric2", 2 * m))
    assert(or.size == 2)
  }

  test("range query evaluates every step") {
    val df = engine.rangeQuery("sum by (foo) (test_metric1)", 0, 2 * m, m)
    val r = resultMap(df)
    assertApprox(r, Map(
      ("foo=bar", 0L) -> 0.0, ("foo=bar", m) -> 100.0, ("foo=bar", 2 * m) -> 200.0,
      ("foo=boo", 0L) -> 1.0, ("foo=boo", m) -> 1.0, ("foo=boo", 2 * m) -> 1.0))
  }

  test("rate with exact extrapolation") {
    // window [5m,10m]: points 500..1000 at 5..10m; samples exactly cover
    // the window → no extrapolation: increase=500, rate=500/300
    val r = resultMap(engine.instant("rate(test_metric1[5m])", 10 * m))
    assertApprox(r, Map(
      ("foo=bar", 10 * m) -> 500.0 / 300.0,
      ("foo=boo", 10 * m) -> 0.0))
    val inc = resultMap(engine.instant("increase(test_metric1[5m])", 10 * m))
    assert(math.abs(inc(("foo=bar", 10 * m)) - 500.0) < 1e-9)
  }

  test("irate uses last two points") {
    val r = resultMap(engine.instant("irate(test_metric1[5m])", 10 * m))
    assertApprox(r, Map(
      ("foo=bar", 10 * m) -> 100.0 / 60.0,
      ("foo=boo", 10 * m) -> 0.0))
  }

  test("over_time family") {
    val avg = resultMap(engine.instant("avg_over_time(test_metric1[5m])", 10 * m))
    assertApprox(avg, Map(
      ("foo=bar", 10 * m) -> 750.0, // (500+600+700+800+900+1000)/6
      ("foo=boo", 10 * m) -> 1.0))
    val cnt = resultMap(engine.instant("count_over_time(test_metric1[5m])", 10 * m))
    assert(cnt(("foo=bar", 10 * m)) == 6.0)
    val q = resultMap(engine.instant("quantile_over_time(0.5, test_metric1[5m])", 10 * m))
    assert(q(("foo=bar", 10 * m)) == 750.0)
  }

  test("counter reset correction in rate") {
    val resetFixture = samplesDF(
      Map("__name__" -> "ctr") -> Seq(
        (0L, 0.0), (60000L, 10.0), (120000L, 20.0), (180000L, 5.0), (240000L, 15.0)))
    val e = new PromQLEngine(spark, resetFixture)
    // increase over [4m] at 4m: window [0,4m], points 0,10,20,5,15
    // correction: +20 at the reset → raw = 15-0+20 = 35; samples exactly
    // cover the window → no extrapolation
    val r = resultMap(e.instant("increase(ctr[4m])", 4 * m))
    assertApprox(r, Map(("", 4 * m) -> 35.0))
  }

  test("deriv and predict_linear on linear series") {
    val r = resultMap(engine.instant("deriv(test_metric1[5m])", 10 * m))
    assertApprox(r, Map(
      ("foo=bar", 10 * m) -> 100.0 / 60.0,
      ("foo=boo", 10 * m) -> 0.0))
    val p = resultMap(engine.instant("predict_linear(test_metric1[5m], 60)", 10 * m))
    // at eval ts value would be 1000; +60s at slope 100/60 → 1100
    assertApprox(p, Map(
      ("foo=bar", 10 * m) -> 1100.0,
      ("foo=boo", 10 * m) -> 1.0))
  }

  test("resets and changes") {
    val f = samplesDF(Map("__name__" -> "x") -> Seq(
      (0L, 1.0), (60000L, 2.0), (120000L, 1.0), (180000L, 1.0), (240000L, 3.0)))
    val e = new PromQLEngine(spark, f)
    assertApprox(resultMap(e.instant("resets(x[5m])", 4 * m)),
      Map(("", 4 * m) -> 1.0))
    assertApprox(resultMap(e.instant("changes(x[5m])", 4 * m)),
      Map(("", 4 * m) -> 3.0))
  }

  test("instant math functions with Go semantics") {
    val f = samplesDF(
      Map("__name__" -> "x", "k" -> "a") -> Seq((0L, 4.0)),
      Map("__name__" -> "x", "k" -> "b") -> Seq((0L, 0.0)),
      Map("__name__" -> "x", "k" -> "c") -> Seq((0L, -1.0)))
    val e = new PromQLEngine(spark, f)
    val ln = resultMap(e.instant("ln(x)", 0))
    assert(ln(("k=a", 0L)) == math.log(4.0))
    assert(ln(("k=b", 0L)).isNegInfinity)
    assert(ln(("k=c", 0L)).isNaN)
    val sq = resultMap(e.instant("sqrt(x)", 0))
    assert(sq(("k=a", 0L)) == 2.0)
    val ab = resultMap(e.instant("abs(x)", 0))
    assert(ab(("k=c", 0L)) == 1.0)
  }

  test("round with toNearest, ties round up") {
    val f = samplesDF(
      Map("__name__" -> "x", "k" -> "a") -> Seq((0L, 2.5)),
      Map("__name__" -> "x", "k" -> "b") -> Seq((0L, -2.5)),
      Map("__name__" -> "x", "k" -> "c") -> Seq((0L, 0.35)))
    val e = new PromQLEngine(spark, f)
    val r = resultMap(e.instant("round(x)", 0))
    assert(r(("k=a", 0L)) == 3.0) // ties up
    assert(r(("k=b", 0L)) == -2.0) // -2.5 → -2 (floor(x+0.5))
    val r2 = resultMap(e.instant("round(x, 0.1)", 0))
    assert(math.abs(r2(("k=c", 0L)) - 0.4) < 1e-9)
  }

  test("histogram_quantile with interpolation") {
    val f = samplesDF(
      Map("__name__" -> "b", "le" -> "0.1") -> Seq((0L, 1.0)),
      Map("__name__" -> "b", "le" -> "0.5") -> Seq((0L, 2.0)),
      Map("__name__" -> "b", "le" -> "+Inf") -> Seq((0L, 3.0)))
    val e = new PromQLEngine(spark, f)
    val r = resultMap(e.instant("histogram_quantile(0.5, b)", 0))
    assertApprox(r, Map(("", 0L) -> 0.3))
  }

  test("staleness markers are never selected") {
    val f = samplesDF(
      Map("__name__" -> "x") -> Seq((0L, 1.0), (60000L, Samples.StaleNaN)))
    val e = new PromQLEngine(spark, f)
    // at 1m the newest lookback point is the stale marker → the series
    // is ABSENT (no fallback to older points, engine.go:789-798)
    assert(e.instant("x", 60000L).count() == 0)
    // before the marker the series is visible as usual
    val r = resultMap(e.instant("x", 30000L))
    assertApprox(r, Map(("__name__=x", 30000L) -> 1.0))
  }

  test("holt_winters") {
    val f = samplesDF(Map("__name__" -> "x") -> Seq(
      (0L, 1.0), (60000L, 2.0), (120000L, 4.0)))
    val e = new PromQLEngine(spark, f)
    // sf=0.5 tf=0.5: s1=1, b=1
    // i=1: x=0.5*2=1, b=b=1, y=0.5*(1+1)=1, s0=1 s1=2
    // i=2: x=0.5*4=2, b=0.5*(2-1)+0.5*1=1, y=0.5*(2+1)=1.5, s1=3.5
    val r = resultMap(e.instant("holt_winters(x[5m], 0.5, 0.5)", 2 * m))
    assertApprox(r, Map(("", 2 * m) -> 3.5))
    // factor-bound messages VERBATIM, incl. the vintage's "goT" typo
    // and the trend branch formatting the SMOOTHING factor's value
    // (functions.go:227-232 passes sf to both Errorf calls)
    val exSf = intercept[IllegalArgumentException] {
      e.instant("holt_winters(x[5m], 2, 0.5)", 2 * m)
    }
    assert(exSf.getMessage.endsWith(
      "invalid smoothing factor. Expected: 0 < sf < 1 goT: 2.000000"),
      exSf.getMessage)
    val exTf = intercept[IllegalArgumentException] {
      e.instant("holt_winters(x[5m], 0.25, 1.5)", 2 * m)
    }
    assert(exTf.getMessage.endsWith(
      "invalid trend factor. Expected: 0 < tf < 1 goT: 0.250000"),
      exTf.getMessage)
  }

  test("absent") {
    val r = resultMap(engine.instant("""absent(nonexistent{job="x"})""", 0))
    assertApprox(r, Map(("job=x", 0L) -> 1.0))
    assert(engine.instant("absent(test_metric1)", 0).count() == 0)
  }

  test("timestamp and time") {
    val r = resultMap(engine.instant("timestamp(test_metric1)", 2 * m))
    assert(r(("foo=bar", 2 * m)) == 120.0)
    val t = resultMap(engine.instant("time()", 2 * m))
    assertApprox(t, Map(("", 2 * m) -> 120.0))
  }

  test("date functions") {
    // value 86400*31 = 1970-02-01T00:00:00Z, a Sunday
    val f = samplesDF(Map("__name__" -> "x") -> Seq((0L, 86400.0 * 31)))
    val e = new PromQLEngine(spark, f)
    assert(resultMap(e.instant("month(x)", 0))(("", 0L)) == 2.0)
    assert(resultMap(e.instant("day_of_month(x)", 0))(("", 0L)) == 1.0)
    assert(resultMap(e.instant("day_of_week(x)", 0))(("", 0L)) == 0.0)
    assert(resultMap(e.instant("days_in_month(x)", 0))(("", 0L)) == 28.0)
    assert(resultMap(e.instant("year(x)", 0))(("", 0L)) == 1970.0)
    assert(resultMap(e.instant("hour(x)", 0))(("", 0L)) == 0.0)
  }

  test("label_replace and label_join") {
    val r = resultMap(engine.instant(
      """label_replace(test_metric1, "dst", "$1-x", "foo", "(b.*)")""", 2 * m))
    assert(r.contains(("__name__=test_metric1,dst=bar-x,foo=bar", 2 * m)))
    val j = resultMap(engine.instant(
      """label_join(test_metric1, "dst", "-", "foo", "foo")""", 2 * m))
    assert(j.contains(("__name__=test_metric1,dst=bar-bar,foo=bar", 2 * m)))
  }

  test("division by zero follows IEEE, not Spark NULL") {
    val r = resultMap(engine.instant("test_metric2 / 0", 2 * m))
    assert(r(("foo=boo", 2 * m)).isPosInfinity)
    val z = resultMap(engine.instant("(test_metric2 - test_metric2) / 0", 2 * m))
    assert(z(("foo=boo", 2 * m)).isNaN)
  }

  test("many-to-many match errors out") {
    // both test_metric1 series vs themselves ignoring foo → duplicate sigs
    val ex = intercept[Exception] {
      engine.instant("test_metric1 + ignoring(foo) test_metric1", 2 * m).collect()
    }
    assert(ex.getMessage != null)
  }

  test("group_left copies labels from the one side") {
    val f = samplesDF(
      Map("__name__" -> "req", "job" -> "a", "inst" -> "1") -> Seq((0L, 10.0)),
      Map("__name__" -> "req", "job" -> "a", "inst" -> "2") -> Seq((0L, 20.0)),
      Map("__name__" -> "info", "job" -> "a", "ver" -> "v1") -> Seq((0L, 2.0)))
    val e = new PromQLEngine(spark, f)
    val r = resultMap(e.instant(
      "req * on(job) group_left(ver) info", 0))
    assertApprox(r, Map(
      ("inst=1,job=a,ver=v1", 0L) -> 20.0,
      ("inst=2,job=a,ver=v1", 0L) -> 40.0))
  }

  test("sort and sort_desc") {
    val df = engine.instant("sort_desc(test_metric1)", 2 * m)
    val vals = df.collect().map(_.getDouble(2)).toSeq
    assert(vals == Seq(200.0, 1.0))
  }

  test("unary minus on vector") {
    // negates values only — the name is KEPT (engine.go:745-757)
    val r = resultMap(engine.instant("-test_metric1", 2 * m))
    assertApprox(r, Map(
      ("__name__=test_metric1,foo=bar", 2 * m) -> -200.0,
      ("__name__=test_metric1,foo=boo", 2 * m) -> -1.0))
  }

  test("min/max/topk aggregations: NaN loses; *_over_time propagates NaN") {
    // NaN in the accumulator is replaced by any real value
    // (engine.go:1346-1353): max{NaN,5,3}=5, min{NaN,5,3}=3.
    // But max_over_time uses Go math.Max, which PROPAGATES NaN
    // (functions.go:414-445).
    val f = samplesDF(
      Map("__name__" -> "x", "k" -> "nan") -> Seq((0L, Double.NaN)),
      Map("__name__" -> "x", "k" -> "five") -> Seq((0L, 5.0)),
      Map("__name__" -> "x", "k" -> "three") -> Seq((0L, 3.0)),
      Map("__name__" -> "allnan", "k" -> "a") -> Seq((0L, Double.NaN)),
      Map("__name__" -> "allnan", "k" -> "b") -> Seq((0L, Double.NaN)))
    val e = new PromQLEngine(spark, f)
    assertApprox(resultMap(e.instant("max(x)", 0)), Map(("", 0L) -> 5.0))
    assertApprox(resultMap(e.instant("min(x)", 0)), Map(("", 0L) -> 3.0))
    // all-NaN group stays NaN
    assert(resultMap(e.instant("max(allnan)", 0))(("", 0L)).isNaN)
    assert(resultMap(e.instant("min(allnan)", 0))(("", 0L)).isNaN)
    // topk: NaN always loses (sorts below every real value)
    val top = resultMap(e.instant("topk(2, x)", 0))
    assertApprox(top, Map(
      ("__name__=x,k=five", 0L) -> 5.0,
      ("__name__=x,k=three", 0L) -> 3.0))
    val bottom = resultMap(e.instant("bottomk(1, x)", 0))
    assertApprox(bottom, Map(("__name__=x,k=three", 0L) -> 3.0))
    // *_over_time: NaN propagates within a series window
    val f2 = samplesDF(
      Map("__name__" -> "y") -> Seq((0L, 1.0), (60000L, Double.NaN), (120000L, 3.0)))
    val e2 = new PromQLEngine(spark, f2)
    assert(resultMap(e2.instant("max_over_time(y[5m])", 120000L))(
      ("", 120000L)).isNaN)
    assert(resultMap(e2.instant("min_over_time(y[5m])", 120000L))(
      ("", 120000L)).isNaN)
  }

  test("quantile aggregation with out-of-range φ yields ∓Inf") {
    val r = resultMap(engine.instant("quantile(1.5, test_metric1)", 2 * m))
    assert(r(("", 2 * m)).isPosInfinity)
    val r2 = resultMap(engine.instant("quantile(-0.5, test_metric1)", 2 * m))
    assert(r2(("", 2 * m)).isNegInfinity)
  }

  test("bucketed *_over_time fast path equals per-step evaluation at window boundaries") {
    // samples deliberately placed ON step boundaries so the closed
    // [t-w, t] window's at-start partial logic is exercised: a sample at
    // exactly t must count for the window ending at t AND the one
    // starting there
    val s = 60000L
    val f = samplesDF(
      Map("__name__" -> "bk", "i" -> "1") ->
        (0 to 20).map(k => (k * s, k.toDouble)),
      Map("__name__" -> "bk", "i" -> "2") ->
        (0 to 20).map(k => (k * s + 7000, 100.0 + k)))
    val e = new PromQLEngine(spark, f)
    for (fn <- Seq("sum_over_time", "count_over_time", "avg_over_time",
        "min_over_time", "max_over_time", "stdvar_over_time")) {
      val q = s"$fn(bk[5m])"
      // range query: 13 steps ⇒ bucketed path fires (range=5m, step=1m)
      val ranged = resultMap(e.rangeQuery(q, 8 * s, 20 * s, s))
      // per-step instants go through the general windowed path
      val perStep = (8 to 20).flatMap(k => resultMap(e.instant(q, k * s)))
        .toMap
      assert(ranged.keySet == perStep.keySet, s"$fn keys")
      ranged.foreach { case (k, v) =>
        val ev = perStep(k)
        assert(v == ev || math.abs(v - ev) <= 1e-9 * math.max(math.abs(v), 1.0),
          s"$fn $k: bucketed=$v general=$ev")
      }
    }
  }

  test("bucketed irate/idelta equals per-step evaluation") {
    val s = 60000L
    val vals = Seq(0.0, 10, 20, 5, 15, 25, 2, 12, 22, 32, 8, 18, 28, 38,
      48, 1, 11, 21, 31, 41, 51)
    val f = samplesDF(
      Map("__name__" -> "iv", "i" -> "a") ->
        vals.zipWithIndex.map { case (v, k) => (k * s, v) },
      Map("__name__" -> "iv", "i" -> "b") ->
        vals.zipWithIndex.map { case (v, k) => (k * s + 13000, v * 3) })
    val e = new PromQLEngine(spark, f)
    for (fn <- Seq("irate", "idelta")) {
      val q = s"$fn(iv[5m])"
      val ranged = resultMap(e.rangeQuery(q, 8 * s, 20 * s, s))
      val perStep = (8 to 20).flatMap(k => resultMap(e.instant(q, k * s))).toMap
      assert(ranged == perStep, s"$fn mismatch")
    }
  }

  test("bucketed rate/increase/delta equals per-step evaluation incl. counter resets") {
    val s = 60000L
    // counter with resets placed both inside buckets and across bucket
    // boundaries, plus samples exactly on step boundaries
    val vals = Seq(0.0, 10, 20, 5, 15, 25, 2, 12, 22, 32, 8, 18, 28, 38,
      48, 1, 11, 21, 31, 41, 51)
    val f = samplesDF(
      Map("__name__" -> "ctr", "i" -> "a") ->
        vals.zipWithIndex.map { case (v, k) => (k * s, v) },
      Map("__name__" -> "ctr", "i" -> "b") ->
        vals.zipWithIndex.map { case (v, k) => (k * s + 13000, v * 2) })
    val e = new PromQLEngine(spark, f)
    for (fn <- Seq("rate", "increase", "delta")) {
      val q = s"$fn(ctr[5m])"
      val ranged = resultMap(e.rangeQuery(q, 8 * s, 20 * s, s))
      val perStep = (8 to 20).flatMap(k => resultMap(e.instant(q, k * s))).toMap
      assert(ranged.keySet == perStep.keySet, s"$fn keys")
      ranged.foreach { case (k, v) =>
        val ev = perStep(k)
        assert(v == ev || math.abs(v - ev) <= 1e-12 * math.max(math.abs(v), 1.0),
          s"$fn $k: bucketed=$v general=$ev")
      }
    }
  }

  test("bucketed instant selector equals per-step evaluation incl. staleness") {
    val s = 60000L
    // lookback 5m, step 1m → m=5, bucketed path on range queries;
    // boundary samples, gaps, and a stale marker mid-series
    val f = samplesDF(
      Map("__name__" -> "sel", "i" -> "1") ->
        Seq((0L, 1.0), (2 * s, 2.0), (5 * s, 5.0), (9 * s + 7000, 9.0),
          (15 * s, 15.0)),
      Map("__name__" -> "sel", "i" -> "2") ->
        Seq((0L, 10.0), (4 * s, 40.0), (6 * s, graft.model.Samples.StaleNaN),
          (12 * s + 1, 120.0)))
    val e = new PromQLEngine(spark, f)
    val ranged = resultMap(e.rangeQuery("sel", 8 * s, 20 * s, s))
    val perStep = (8 to 20).flatMap(k => resultMap(e.instant("sel", k * s))).toMap
    assert(ranged == perStep)
    // the stale marker hides series 2 until 12m+1ms arrives
    assert(!ranged.contains(("__name__=sel,i=2", 10 * s)))
    assert(ranged(("__name__=sel,i=2", 13 * s)) == 120.0)
  }

  test("topk is deterministic under exact value ties") {
    val f = samplesDF(
      Map("__name__" -> "t", "k" -> "a") -> Seq((0L, 7.0)),
      Map("__name__" -> "t", "k" -> "b") -> Seq((0L, 7.0)),
      Map("__name__" -> "t", "k" -> "c") -> Seq((0L, 7.0)))
    val e = new PromQLEngine(spark, f)
    val r = resultMap(e.instant("topk(2, t)", 0))
    // ties break on the canonical label string: a, b win
    assertApprox(r, Map(
      ("__name__=t,k=a", 0L) -> 7.0,
      ("__name__=t,k=b", 0L) -> 7.0))
  }

  test("partial re-aggregation: a coarser sum consumes the finer partials") {
    // share-of-total: the global sum must re-aggregate the by-foo
    // result (groups × steps rows) instead of re-reducing the raw
    // sample volume — observable via the engine's hit counter
    val before = engine.reaggHits.get()
    val df = engine.instant(
      "sum by (foo) (test_metric1) / on() group_left sum(test_metric1)",
      2 * m)
    assert(engine.reaggHits.get() == before + 1,
      "the global sum did not re-aggregate the by-foo partials")
    val r = resultMap(df)
    assertApprox(r, Map(
      ("foo=bar", 2 * m) -> 200.0 / 201.0,
      ("foo=boo", 2 * m) -> 1.0 / 201.0))
  }

  test("without re-aggregation: dropping more labels folds the finer result") {
    val before = engine.reaggHits.get()
    val df = engine.instant(
      "sum without (foo) (test_metric1) + sum without (foo, nosuch) (test_metric1)",
      2 * m)
    assert(engine.reaggHits.get() == before + 1)
    val r = resultMap(df)
    assertApprox(r, Map(("", 2 * m) -> 402.0))
  }

  test("bucketQuantile: NaN counts pass through ensureMonotonic like Go") {
    import org.apache.spark.sql.Row
    // counts (5, NaN, 7, 10): rank 6 selects the bucket AFTER the NaN,
    // so Go's count/rank subtraction sees the untouched NaN and the
    // result is NaN; raising the NaN to the running max (the old
    // behavior) would interpolate a finite value instead
    val rows = Seq(Row(1.0, 5.0), Row(2.0, Double.NaN), Row(3.0, 7.0),
      Row(Double.PositiveInfinity, 10.0))
    assert(PromUdfs.bucketQuantile(0.6, rows).isNaN)
    // sort.Search is a BINARY search: at q=0.2 (rank 2) Go probes
    // h=1 first (NaN>=2 is false, so i=2), lands on b=2, and the
    // count/rank subtraction against the untouched NaN yields NaN —
    // a linear scan would stop at b=0 and interpolate 0.4 instead
    assert(PromUdfs.bucketQuantile(0.2, rows).isNaN)
  }

  test("bucketQuantile: ensureMonotonic never raises the +Inf bucket") {
    import org.apache.spark.sql.Row
    // Go's `for i := range buckets[1:]` indexes buckets[i] — the last
    // (+Inf) bucket is outside the effective range, so a +Inf count
    // BELOW the running max stays put and rank = q * 6, not q * 7
    val rows = Seq(Row(1.0, 5.0), Row(2.0, 7.0),
      Row(Double.PositiveInfinity, 6.0))
    // rank = 0.5 * 6 = 3 -> b=0 -> 0 + 1 * (3/5) = 0.6
    // (raising +Inf to 7 would give rank 3.5 -> 0.7)
    assert(PromUdfs.bucketQuantile(0.5, rows) == 0.6)
  }
}

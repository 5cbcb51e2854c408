package graft.exec

import graft.SparkTestBase

/** Route equivalence for the sliding prefix-sum fold
  * ([[PromQLEngine.slidingFold]]): for every subtractable
  * `*_over_time` the sliding route must produce the same result set
  * as the fan-out (explode) route on a fixture that exercises the
  * sharp edges — NaN poisoning, ±Inf reconstruction, sparse series
  * with bucket gaps, at-start (closed-window) points, off-grid
  * samples, staleness markers, and windows wider than the explode
  * path's m ≤ 512 cap. */
class SlidingFoldSpec extends SparkTestBase {

  private val funcs = Seq("count_over_time", "sum_over_time",
    "avg_over_time")

  private def fixture = samplesDF(
    // dense on-grid series with NaN and an isolated +Inf and -Inf
    Map("__name__" -> "sf_m", "k" -> "dense") ->
      (0 to 80).map(i => (i * 1000L, i match {
        case 35 => Double.NaN
        case 50 => Double.PositiveInfinity
        case 52 => Double.NegativeInfinity
        case _ => (i % 7) + 0.5
      })),
    // sparse: multi-bucket gaps; 30000 lands exactly on an eval step
    Map("__name__" -> "sf_m", "k" -> "sparse") ->
      Seq(0L -> 1.0, 7000L -> 2.0, 29000L -> 3.0, 30000L -> 4.0,
        61000L -> 5.0, 80000L -> 6.0),
    // never at a bucket start
    Map("__name__" -> "sf_m", "k" -> "offgrid") ->
      (0 to 39).map(i => (500L + i * 2000L, i.toDouble)),
    // +Inf and -Inf together inside one window -> NaN sum
    Map("__name__" -> "sf_m", "k" -> "infpair") ->
      Seq(40000L -> Double.PositiveInfinity, 41000L -> Double.NegativeInfinity,
        70000L -> 9.0),
    // a marker: range selection must exclude it on BOTH routes
    Map("__name__" -> "sf_m", "k" -> "ends") ->
      Seq(31000L -> 1.5, 33000L -> graft.model.Samples.StaleNaN, 60000L -> 2.5))

  private def run(q: String, start: Long, end: Long, step: Long,
      minM: Int): Map[(String, Long), Double] = {
    val prev = PromQLEngine.slideMinM
    PromQLEngine.slideMinM = minM
    try resultMap(new PromQLEngine(spark, fixture)
      .rangeQuery(q, start, end, step))
    finally PromQLEngine.slideMinM = prev
  }

  private def assertSame(a: Map[(String, Long), Double],
      b: Map[(String, Long), Double]): Unit = {
    assert(a.keySet == b.keySet,
      s"key sets differ: only-sliding=${a.keySet -- b.keySet} " +
        s"only-explode=${b.keySet -- a.keySet}")
    b.foreach { case (k, e) =>
      val s = a(k)
      if (e.isNaN) assert(s.isNaN, s"$k: explode NaN, sliding $s")
      else if (e.isInfinite) assert(s == e, s"$k: explode $e, sliding $s")
      else {
        val tol = math.max(1e-9, math.abs(e) * 1e-9)
        assert(math.abs(s - e) <= tol, s"$k: explode $e, sliding $s")
      }
    }
  }

  for (fn <- funcs)
    test(s"$fn: sliding == explode on the edge-case fixture (m=24)") {
      val q = s"$fn(sf_m[24s])"
      val sliding = run(q, 30000, 80000, 1000, minM = 16)
      val explode = run(q, 30000, 80000, 1000, minM = Int.MaxValue)
      assert(sliding.nonEmpty)
      assertSame(sliding, explode)
    }

  test("count_over_time: sliding serves m=600, past the explode cap, " +
      "matching the general path") {
    val q = "count_over_time(sf_m[60s])"
    // m = 600 at step 100ms: the explode route's m <= 512 cap sends
    // minM=MaxValue down the general (per-sample window) path — the
    // semantics oracle for the uncapped sliding route
    val sliding = run(q, 60000, 80000, 100, minM = 16)
    val general = run(q, 60000, 80000, 100, minM = Int.MaxValue)
    assert(sliding.nonEmpty)
    assertSame(sliding, general)
  }

  test("stddev/stdvar never route sliding: the subtractable sumsq form " +
      "cancels catastrophically when variance << mean^2") {
    // same exclusion (and reason) as bucketFoldFuncs — a whole-span
    // prefix of squares is strictly worse than the per-bucket form
    // that was already measured and rejected
    for (fn <- Seq("stddev_over_time", "stdvar_over_time")) {
      val plan = new PromQLEngine(spark, fixture)
        .rangeQuery(s"$fn(sf_m[24s])", 30000, 80000, 1000)
        .queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("windowspecdefinition"),
        s"$fn must not take the sliding route")
    }
  }

  test("density cost model: a sparse table keeps the explode route " +
      "(sliding's dense step coverage would dominate its tiny partials)") {
    // ~3 samples per series over an 80s span: the explode side is
    // partials × m ≈ 3 × 24 rows/series, far below sliding's
    // 2 × (steps + m) ≈ 150 — the cost model must pick explode
    val sparse = samplesDF(
      (0 until 4).map(i =>
        Map("__name__" -> "sp_m", "k" -> i.toString) ->
          Seq(0L -> 1.0, 40000L -> 2.0, 80000L -> 3.0)): _*)
    val plan = new PromQLEngine(spark, sparse)
      .rangeQuery("sum_over_time(sp_m[24s])", 30000, 80000, 1000)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("windowspecdefinition"),
      s"sparse table routed to sliding (Window in plan):\n$plan")
    // the dense fixture DOES route sliding: its plan carries the
    // prefix-sum window
    val densePlan = new PromQLEngine(spark, fixture)
      .rangeQuery("sum_over_time(sf_m[24s])", 30000, 80000, 1000)
      .queryExecution.optimizedPlan.toString
    assert(densePlan.toLowerCase.contains("windowspecdefinition"),
      "dense fixture should route to the sliding fold")
  }

  test("sum_over_time: a window holding ONLY the at-start point " +
      "matches on both routes") {
    // sparse series: at t=61000 the [24s] window reaches back to
    // 37000 — only the 61000 sample (its own at-start) is inside
    val q = "sum_over_time(sf_m[24s])"
    val sliding = run(q, 61000, 68000, 1000, minM = 16)
    val explode = run(q, 61000, 68000, 1000, minM = Int.MaxValue)
    assertSame(sliding, explode)
    assert(sliding.exists { case ((l, t), v) =>
      l.contains("k=sparse") && t == 61000L && v == 5.0 })
  }
}

package graft.testkit

import graft.SparkTestBase

/** DSL-driven golden corpus in the reference harness format
  * (`promql/test.go`), covering selector, aggregation, binop, function,
  * and staleness semantics with hand-computed expectations. */
class PromTestDslSpec extends SparkTestBase {

  private def run(script: String): Unit = PromTestDsl.run(spark, script)

  test("selectors, aggregations, vector matching") {
    run("""
load 5m
  http_requests{job="api", instance="0"} 0+10x10
  http_requests{job="api", instance="1"} 0+20x10
  http_requests{job="app", instance="0"} 0+30x10

eval instant at 50m http_requests{job="api"}
  http_requests{job="api", instance="0"} 100
  http_requests{job="api", instance="1"} 200

eval instant at 52m http_requests{instance="0"} offset 2m
  http_requests{job="api", instance="0"} 100
  http_requests{job="app", instance="0"} 300

eval instant at 50m sum by (job) (http_requests)
  {job="api"} 300
  {job="app"} 300

eval instant at 50m sum without (instance) (http_requests)
  {job="api"} 300
  {job="app"} 300

eval instant at 50m sum(http_requests) / count(http_requests)
  {} 200

eval instant at 50m topk(1, http_requests)
  http_requests{job="app", instance="0"} 300

eval instant at 50m quantile(0.5, http_requests)
  {} 200

eval instant at 50m stddev(http_requests)
  {} 81.649658

# scalar() of a multi-element vector is NaN (functions.go:352-365)
eval instant at 50m scalar(http_requests)
  {} NaN

eval instant at 50m sum by () (http_requests)
  {} 600

eval_ordered instant at 50m sort_desc(http_requests)
  http_requests{job="app", instance="0"} 300
  http_requests{job="api", instance="1"} 200
  http_requests{job="api", instance="0"} 100

eval_fail instant at 50m http_requests + on(job) http_requests
""")
  }

  test("binary operators and set operations") {
    run("""
load 5m
  foo{job="a"} 1+1x10
  bar{job="a"} 2+2x10

eval instant at 50m foo + bar
  {job="a"} 33

eval instant at 50m bar / foo
  {job="a"} 2

eval instant at 50m foo * 2 + 1
  {job="a"} 23

eval instant at 50m 2 ^ 3 ^ 2
  {} 512

eval instant at 50m 7 % 3 - 1
  {} 0

eval instant at 50m foo > 5
  foo{job="a"} 11

eval instant at 50m foo > bool 5
  foo{job="a"} 1

eval instant at 50m foo > 100

# set ops match on labels EXCLUDING __name__ by default, so foo and bar
# share the signature {job="a"}
eval instant at 50m foo or bar
  foo{job="a"} 11

eval instant at 50m foo and bar
  foo{job="a"} 11

eval instant at 50m foo unless bar

eval instant at 50m foo and on(job) bar
  foo{job="a"} 11

# ignoring(job) leaves an empty matching signature on both sides
eval instant at 50m foo + ignoring(job) bar
  {} 33

# vector-vector comparison with bool returns 0/1; this vintage KEEPS
# __name__ (shouldDropMetricName lists only + - * / %, engine.go:1460)
eval instant at 50m foo >= bool bar
  foo{job="a"} 0

eval instant at 50m foo < bool bar
  foo{job="a"} 1
""")
  }

  test("group_right mirrors group_left with sides swapped") {
    run("""
load 5m
  req{job="a", inst="1"} 0+10x10
  req{job="a", inst="2"} 0+20x10
  info{job="a", ver="v1"} 2+0x10

eval instant at 50m info * on(job) group_right(ver) req
  {job="a", inst="1", ver="v1"} 200
  {job="a", inst="2", ver="v1"} 400
""")
  }

  test("instant functions") {
    run("""
load 5m
  foo{job="a"} 1+1x10

eval instant at 50m abs(-1 * foo)
  {job="a"} 11

eval instant at 50m ln(vector(0))
  {} -Inf

eval instant at 50m ln(vector(-1))
  {} NaN

eval instant at 50m round(vector(1.25), 0.5)
  {} 1.5

eval instant at 50m clamp_max(foo, 5)
  {job="a"} 5

eval instant at 50m absent(nonexistent{here="x"})
  {here="x"} 1

eval instant at 50m absent(foo)

eval instant at 50m vector(time())
  {} 3000

eval instant at 50m scalar(foo)
  {} 11

eval_fail instant at 50m holt_winters(foo[20m], 2, 0.5)

eval instant at 50m timestamp(foo)
  {job="a"} 3000

eval instant at 50m label_replace(foo, "new", "$1-x", "job", "(.*)")
  foo{job="a", new="a-x"} 11

eval instant at 50m label_join(foo, "combo", "-", "job", "job")
  foo{job="a", combo="a-a"} 11

eval instant at 0m day_of_week(vector(0))
  {} 4

eval instant at 0m days_in_month(vector(86400))
  {} 31

eval instant at 0m year()
  {} 1970
""")
  }

  test("range functions: exact extrapolation on aligned windows") {
    run("""
load 5m
  cnt 0+10x10

eval instant at 50m delta(cnt[50m])
  {} 100

eval instant at 50m increase(cnt[50m])
  {} 100

eval instant at 50m rate(cnt[50m])
  {} 0.0333333333

eval instant at 50m sum_over_time(cnt[50m])
  {} 550

eval instant at 50m avg_over_time(cnt[50m])
  {} 50

eval instant at 50m count_over_time(cnt[50m])
  {} 11

eval instant at 50m quantile_over_time(0.5, cnt[50m])
  {} 50

clear

load 5m
  rst 0 10 20 5 15

eval instant at 20m resets(rst[20m])
  {} 1

eval instant at 20m changes(rst[20m])
  {} 4

eval instant at 20m increase(rst[20m])
  {} 35

eval instant at 20m idelta(rst[20m])
  {} 10

eval instant at 20m irate(rst[20m])
  {} 0.0333333333
""")
  }

  test("histogram_quantile on cumulative buckets") {
    run("""
load 5m
  bkt{le="1"} 0+10x10
  bkt{le="2"} 0+20x10
  bkt{le="+Inf"} 0+30x10

eval instant at 50m histogram_quantile(0.5, bkt)
  {} 1.5

eval instant at 50m histogram_quantile(0, bkt)
  {} 0

eval instant at 50m histogram_quantile(1, bkt)
  {} 2

eval instant at 50m histogram_quantile(1.1, bkt)
  {} Inf

eval instant at 50m histogram_quantile(-1, bkt)
  {} -Inf
""")
  }

  test("typecheck and evaluation failures (parse.go:996-1121 semantics)") {
    run("""
load 5m
  m{job="api", instance="0"} 0+10x10
  m{job="api", instance="1"} 0+20x10

eval_fail instant at 50m unknown_function(m)

eval_fail instant at 50m 1 > 2

eval instant at 50m 1 > bool 2
  {} 0

eval_fail instant at 50m m + on(job) m

eval_fail instant at 50m rate(m)

eval_fail instant at 50m m and 1

eval_fail instant at 50m sum(m) + "a string"

eval_fail instant at 50m {job=~".*"}

eval_fail instant at 50m label_replace(m, "0bad", "x", "job", "(.*)")

eval_fail instant at 50m label_join(m, "0bad", "-", "job")

eval instant at 50m topk(0, m)

eval instant at 50m m{nosuch!=""}
""")
  }

  test("group_left label transfer and count_values") {
    run("""
load 5m
  req{job="a", inst="1"} 0+10x10
  req{job="a", inst="2"} 0+10x10
  info{job="a", ver="v1"} 1+0x10

eval instant at 50m req * on(job) group_left(ver) info
  {job="a", inst="1", ver="v1"} 100
  {job="a", inst="2", ver="v1"} 100

eval instant at 50m count_values("val", req)
  {val="100"} 2

eval instant at 50m req == 100
  req{job="a", inst="1"} 100
  req{job="a", inst="2"} 100

eval instant at 50m req != bool 100
  req{job="a", inst="1"} 0
  req{job="a", inst="2"} 0
""")
  }

  test("NaN semantics: aggregation NaN loses, *_over_time NaN wins") {
    run("""
load 5m
  m{s="a"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  m{s="b"} 0+5x10
  m{s="c"} 0+10x10

# min/max aggregation: a NaN accumulator is REPLACED by any real value
# (engine.go:1346-1353) — NaN only survives if the whole group is NaN
eval instant at 50m max(m)
  {} 100

eval instant at 50m min(m)
  {} 50

eval instant at 50m max(m{s="a"})
  {} NaN

# topk: NaN always loses the heap comparison (engine.go:1364-1384)
eval instant at 50m topk(2, m)
  m{s="c"} 100
  m{s="b"} 50

eval instant at 50m bottomk(1, m)
  m{s="b"} 50

# *_over_time use Go math.Min/Max, which PROPAGATE NaN
# (functions.go:414-445)
eval instant at 50m max_over_time(m{s="a"}[30m])
  {s="a"} NaN

eval instant at 50m max_over_time(m{s="b"}[30m])
  {s="b"} 50
""")
  }

  test("edge semantics: quantile bounds, histogram without +Inf, or-dedup") {
    run("""
load 5m
  m{s="a"} 0+10x10
  m{s="b"} 0+20x10
  nf{le="10"} 0+1x10
  nf{le="50"} 0+3x10

# quantile at the bounds is exact min / max
eval instant at 50m quantile(0, m)
  {} 100

eval instant at 50m quantile(1, m)
  {} 200

# histogram_quantile requires a +Inf bucket (quantile.go:106-110)
eval instant at 50m histogram_quantile(0.9, nf)
  {} NaN

# or: the left side wins for identical label sets (engine.go:1173-1189)
eval instant at 50m m or (m * 100)
  m{s="a"} 100
  m{s="b"} 200

# a sample exactly at the window start is INSIDE the closed window
eval instant at 10m count_over_time(m{s="a"}[10m])
  {s="a"} 3

# offset composes under aggregation
eval instant at 52m sum(m offset 2m)
  {} 300

# topk with k larger than the series count returns everything
eval instant at 50m topk(10, m)
  m{s="b"} 200
  m{s="a"} 100

# count_values formats like Go strconv (no trailing .0)
eval instant at 50m count_values("v", m / 8)
  {v="12.5"} 1
  {v="25"} 1
""")
  }

  test("scalar arithmetic edges: division by zero, precedence, unary") {
    run("""
load 5m
  foo{job="a"} 1+1x10

# IEEE semantics carried through Go: x/0 is signed Inf, 0/0 is NaN
eval instant at 50m foo / 0
  {job="a"} Inf

eval instant at 50m -foo / 0
  {job="a"} -Inf

eval instant at 50m vector(0) / 0
  {} NaN

eval instant at 50m vector(0) ^ 0
  {} 1

# precedence: ^ binds tighter than * %, which bind tighter than +
eval instant at 50m 2 + 3 * 2 ^ 2 % 3
  {} 2

eval instant at 50m 2 - -1
  {} 3

# arithmetic drops the metric name but keeps the labels
eval instant at 50m foo + 0
  {job="a"} 11

eval instant at 50m foo % 4
  {job="a"} 3

# aggregating an empty selection yields an empty vector
eval instant at 50m sum(nonexistent)

eval instant at 50m vector(1) + vector(2)
  {} 3
""")
  }

  test("regex matchers, absent matcher labels, label_replace edges") {
    run("""
load 5m
  m{s="a"} 0+10x10
  m{s="b"} 0+20x10
  m{s="ax"} 0+30x10

# regex matchers are fully anchored (^(?:re)$)
eval instant at 50m m{s=~"a|b"}
  m{s="a"} 100
  m{s="b"} 200

eval instant at 50m m{s!~"a.*"}
  m{s="b"} 200

# absent() copies only EQUALITY matchers into the synthetic labels
eval instant at 50m absent(nothing{job=~"x", a="1"})
  {a="1"} 1

# a non-matching regex leaves the metric unchanged (functions.go:779-823)
eval instant at 50m label_replace(m{s="a"}, "new", "$1", "s", "nomatch")
  m{s="a"} 100

# an empty expansion REMOVES the destination label
eval instant at 50m label_replace(m{s="a"}, "s", "", "s", "(.*)")
  m 100

eval_ordered instant at 50m sort(m{s=~"a|b"})
  m{s="a"} 100
  m{s="b"} 200
""")
  }

  test("exact values: deriv family, holt_winters, spread aggregations") {
    run("""
load 5m
  cnt 0+10x10
  m{s="a"} 0+10x10
  m{s="b"} 0+20x10

# least-squares slope of an exactly linear series: 10 per 300 s
eval instant at 50m deriv(cnt[50m])
  {} 0.0333333333

eval instant at 50m predict_linear(cnt[50m], 300)
  {} 110

# double exponential smoothing reproduces a linear series exactly
eval instant at 50m holt_winters(cnt[50m], 0.5, 0.5)
  {} 100

eval instant at 50m min_over_time(cnt[50m])
  {} 0

# population stddev/stdvar of 0,10,...,100
eval instant at 50m stdvar_over_time(cnt[50m])
  {} 1000

eval instant at 50m stddev_over_time(cnt[50m])
  {} 31.6227766

eval instant at 50m stdvar(m)
  {} 2500

# interpolated quantile between 100 and 200
eval instant at 50m quantile(0.9, m)
  {} 190

# avg/sum PROPAGATE NaN (unlike min/max, which drop it)
eval instant at 50m avg(m or vector(NaN))
  {} NaN

eval instant at 50m time() / 60
  {} 50

clear

load 5m
  rst 0 10 20 5 15

# rate = increase / range on the reset-corrected series
eval instant at 20m rate(rst[20m])
  {} 0.0291666667

clear

load 5m
  hour_m 90000+0x10

eval instant at 0m hour(hour_m)
  {} 1

eval instant at 50m month(vector(0))
  {} 1

eval instant at 50m day_of_month(vector(0))
  {} 1
""")
  }

  test("round half-up, monotonic envelope, NaN transitions, dup errors") {
    run("""
load 5m
  m{s="a"} 0+10x10
  m{s="b"} 0+20x10
  nm{le="1"} 0+20x10
  nm{le="2"} 0+10x10
  nm{le="+Inf"} 0+30x10
  one{g="1", s="a"} 1+0x10
  one{g="1", s="b"} 1+0x10
  many{g="1", mm="x"} 0+10x10

# ensureMonotonic: a decreasing bucket count is raised to the running
# max (quantile.go:143-153); rank 150 of 300 falls inside [0,1] at 0.75
eval instant at 50m histogram_quantile(0.5, nm)
  {} 0.75

# round() rounds half UP (floor(v+0.5)) — also for negatives, where
# half-even or trunc would differ (functions.go:331-350)
eval instant at 50m round(vector(2.5))
  {} 3

eval instant at 50m round(vector(-2.5))
  {} -2

# a range selector composes with offset: window is [40m, 50m] closed
eval instant at 52m count_over_time(m{s="a"}[10m] offset 2m)
  {s="a"} 3

# sort ascending still puts NaN LAST (comparators 1251-1307)
eval_ordered instant at 50m sort(m or vector(NaN))
  m{s="a"} 100
  m{s="b"} 200
  {} NaN

# group_left requires the "one" side to be unique per signature
eval_fail instant at 50m many * on(g) group_left one

# label_replace may not produce duplicate output label sets
eval_fail instant at 50m label_replace(m, "s", "same", "s", "(.*)")

clear

load 5m
  ch 0 NaN NaN 0
  ir 0 10 5

# NaN -> NaN is NOT a change; 0 -> NaN and NaN -> 0 are
# (functions.go:755-776)
eval instant at 15m changes(ch[15m])
  {} 2

# irate across a counter reset uses the last raw value / interval
# (functions.go:145-191): (5 after reset) / 300 s
eval instant at 10m irate(ir[10m])
  {} 0.0166666667
""")
  }

  test("offset ranges, Inf arithmetic, count_values formats, empty on()") {
    run("""
load 5m
  cnt 0+10x10
  m{s="a"} 0+10x10
  m{s="b"} 0+20x10
  hb{le="+Inf"} 0+10x10

# offset composes with RANGE selectors in rate/increase: the window is
# [20m, 40m] closed, samples 40..80, boundary-aligned so factor = 1
eval instant at 50m increase(cnt[20m] offset 10m)
  {} 40

eval instant at 50m rate(cnt[20m] offset 10m)
  {} 0.0333333333

# IEEE infinities flow through binops and aggregations
eval instant at 50m vector(Inf) + vector(-Inf)
  {} NaN

eval instant at 50m sum(m or vector(Inf))
  {} Inf

eval instant at 50m min(m or vector(Inf))
  {} 100

eval instant at 50m avg(m or vector(Inf))
  {} Inf

# topk: NaN compares lowest, so it never displaces a real value
eval instant at 50m topk(1, m or vector(NaN))
  m{s="b"} 200

# bottomk output is ordered ascending by value
eval_ordered instant at 50m bottomk(2, m)
  m{s="a"} 100
  m{s="b"} 200

# count_values formats negatives and NaN like Go strconv
eval instant at 50m count_values("v", 0 - m / 8)
  {v="-12.5"} 1
  {v="-25"} 1

eval instant at 50m count_values("v", m * (0 / 0))
  {v="NaN"} 2

# grouping by a label no series carries collapses to one group
eval instant at 50m sum by (nosuch) (m)
  {} 300

# empty on(): every lhs series matches iff the rhs is non-empty
eval instant at 50m m{s="a"} and on() m{s="b"}
  m{s="a"} 100

eval instant at 50m m{s="a"} unless on() m{s="b"}

eval instant at 50m m unless on() nonexistent
  m{s="a"} 100
  m{s="b"} 200

eval instant at 50m m{s="a"} + on() vector(5)
  {} 105

# histogram_quantile needs >= 2 buckets even when +Inf is present
eval instant at 50m histogram_quantile(0.5, hb)
  {} NaN

# date functions: leap-year February and the minute() default argument
eval instant at 50m days_in_month(vector(1707523200))
  {} 29

eval instant at 50m minute()
  {} 50
""")
  }

  test("grouped param aggregators, fmod signs, filters on range results") {
    run("""
load 5m
  http_requests{job="api", instance="0"} 0+10x10
  http_requests{job="api", instance="1"} 0+20x10
  http_requests{job="app", instance="0"} 0+30x10
  cnt 0+10x10

# topk/bottomk respect the grouping: one heap per group
eval instant at 50m topk by (job) (1, http_requests)
  http_requests{job="api", instance="1"} 200
  http_requests{job="app", instance="0"} 300

eval instant at 50m bottomk by (job) (1, http_requests)
  http_requests{job="api", instance="0"} 100
  http_requests{job="app", instance="0"} 300

# quantile with a without clause: exact interpolation per group
eval instant at 50m quantile without (instance) (0.5, http_requests)
  {job="api"} 150
  {job="app"} 300

# count_values composes with grouping
eval instant at 50m count_values by (job) ("v", http_requests)
  {job="api", v="100"} 1
  {job="api", v="200"} 1
  {job="app", v="300"} 1

# % is Go math.Mod: the result takes the DIVIDEND's sign
eval instant at 50m -7 % 3
  {} -1

eval instant at 50m 7 % -3
  {} 1

# fractional negative exponent
eval instant at 50m 2 ^ -0.5
  {} 0.7071067812

# comparison filters apply to range-function results like any vector
eval instant at 50m rate(cnt[50m]) > 0.03
  {} 0.0333333333

eval instant at 50m rate(cnt[50m]) > 0.04

# share-of-total: the global sum re-aggregates the by-group partials
# (partial re-aggregation); results must be the plain ratios
eval instant at 50m sum by (job) (http_requests) / on() group_left sum(http_requests)
  {job="api"} 0.5
  {job="app"} 0.5

# finer side evaluated first, coarser re-aggregates its partials
eval instant at 50m sum by (job, instance) (http_requests) / on(job) group_left sum by (job) (http_requests)
  {job="api", instance="0"} 0.3333333333
  {job="api", instance="1"} 0.6666666667
  {job="app", instance="0"} 1

# count partials merge with SUM; min/max partials re-min/max
eval instant at 50m count(http_requests) + min(http_requests) + max(http_requests)
  {} 403

# without forms re-aggregate in the opposite set direction: dropping
# MORE labels is the coarser grouping
eval instant at 50m sum without (instance) (http_requests) / on() group_left sum without (instance, job) (http_requests)
  {job="api"} 0.5
  {job="app"} 0.5
""")
  }

  test("single-point windows, NaN quantile, missing join labels") {
    run("""
load 5m
  single 5
  m{s="a"} 0+10x10

# rate/deriv need two points; a single-sample window yields nothing
eval instant at 5m rate(single[10m])

eval instant at 5m deriv(single[10m])

# but fold-style functions emit from one point
eval instant at 5m changes(single[10m])
  {} 0

eval instant at 5m resets(single[10m])
  {} 0

eval instant at 2m stddev(single)
  {} 0

eval instant at 50m scalar(vector(5))
  {} 5

# NaN quantile parameter ERRORS (r14 correction of an earlier wrong
# pin): the NaN rank reaches values[int(NaN)] — on the reference's
# amd64 builds int(NaN) is the most-negative int64, the index panics,
# and recover() surfaces "unexpected error" (quantile.go:176-182,
# engine.go:599-614; arm64 would convert NaN to 0 instead — we pin
# the amd64 reference binary's behavior)
eval_fail instant at 50m quantile(0/0, m)

# label_join treats missing source labels as empty strings
eval instant at 50m label_join(m{s="a"}, "dst", "-", "s", "nosuch")
  m{s="a", dst="a-"} 100

# negative horizon extrapolates backwards from the eval timestamp
eval instant at 50m predict_linear(m{s="a"}[30m], -600)
  {s="a"} 80

eval_fail instant at 50m holt_winters(m{s="a"}[30m], 0.5, 2)
""")
  }

  test("staleness: a marker as the newest lookback point hides the series") {
    run("""
load 5m
  st 0 1 stale 3

eval instant at 5m st
  st 1

eval instant at 10m st

eval instant at 11m st

eval instant at 15m st
  st 3

# markers are dropped from RANGE selections too: the window [0,15m]
# holds samples 0, 1, stale, 3 -> three real points
eval instant at 15m count_over_time(st[15m])
  {} 3

eval instant at 15m sum_over_time(st[15m])
  {} 4

# the rate family sees the same marker-free points {0, 1, 3}: no
# reset across the dropped marker (1 -> 3 rises), increase = 3,
# boundary samples sit exactly on the window edges so extrapolation
# is the identity; rate = 3 / 900s
eval instant at 15m increase(st[15m])
  {} 3

eval instant at 15m rate(st[15m])
  {} 0.0033333333333333335
""")
  }

  test("Go pow special cases, mixed-Inf aggregation, quantile_over_time range") {
    run("""
load 5m
  pn{s="p"} Inf Inf Inf Inf Inf Inf Inf Inf Inf Inf Inf
  pn{s="n"} -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf
  cnt 0+10x10
  ctr 1 100 200
  hq{le="1"} 0+10x10
  hq{le="+Inf"} 0+20x10

# math.Pow special cases: x^0 = 1 and 1^y = 1 even for NaN/Inf args
eval instant at 50m (0/0) ^ 0
  {} 1

eval instant at 50m 1 ^ (0/0)
  {} 1

eval instant at 50m 1 ^ (1/0)
  {} 1

eval instant at 50m (0/0) ^ 2
  {} NaN

eval instant at 50m 2 ^ (0/0)
  {} NaN

# Pow(-1, +Inf) = 1; Pow(+0, -1) = +Inf; |x| < 1 to +Inf is 0
eval instant at 50m (0 - 1) ^ (1/0)
  {} 1

eval instant at 50m 0 ^ (0 - 1)
  {} Inf

eval instant at 50m 0.5 ^ (1/0)
  {} 0

# +Inf and -Inf in one aggregation group: sum/avg drown to NaN,
# min/max keep their ordered winners
eval instant at 50m sum(pn)
  {} NaN

eval instant at 50m avg(pn)
  {} NaN

eval instant at 50m max(pn)
  {} Inf

eval instant at 50m min(pn)
  {} -Inf

# quantile_over_time clamps out-of-range phi to +/-Inf (quantile.go)
eval instant at 50m quantile_over_time(1.5, cnt[50m])
  {} Inf

eval instant at 50m quantile_over_time(-0.5, cnt[50m])
  {} -Inf

# clamp_{max,min} are Go Min/Max: a NaN limit NaNs every sample
eval instant at 50m clamp_max(cnt, (0/0))
  {} NaN

eval instant at 50m clamp_min(cnt, (0/0))
  {} NaN

# NaN comparisons under bool: equality with NaN is always 0
eval instant at 50m (0/0) == bool (0/0)
  {} 0

eval instant at 50m (0/0) != bool (0/0)
  {} 1

# count_values OVERWRITES an existing label with the formatted value
# (labels.Builder.Set in engine.go's aggregation loop)
eval instant at 50m count_values("s", pn)
  {s="+Inf"} 1
  {s="-Inf"} 1

# __name__ is an ordinary grouping label for by()
eval instant at 50m sum by (__name__) (pn)
  pn NaN

# topk's k goes through evalInt: fractional truncates toward zero,
# NaN / beyond-int64 error (engine.go:637-643)
eval instant at 50m topk(1.9, pn)
  pn{s="p"} Inf

eval_fail instant at 50m topk(1e300, pn)

eval_fail instant at 50m topk((0/0), pn)

# counter zero-point clamp (functions.go:85-96): the window reaches
# 40m before the first sample, but a counter cannot extrapolate below
# zero, so increase anchors at the zero crossing -> the full 0->200
# rise. delta has no clamp: start extrapolates by half-spacing only
# (2400s > 330s threshold), end by 0 -> 199 * 750/600
eval instant at 10m increase(ctr[50m])
  {} 200

eval instant at 10m delta(ctr[50m])
  {} 248.75

# date functions on pre-epoch timestamps: -1s is 1969-12-31T23:59:59
# UTC, a Wednesday (Go time.Unix semantics)
eval instant at 50m year(vector(0 - 1))
  {} 1969

eval instant at 50m month(vector(0 - 1))
  {} 12

eval instant at 50m day_of_week(vector(0 - 1))
  {} 3

eval instant at 50m hour(vector(0 - 1))
  {} 23

eval instant at 50m minute(vector(0 - 1))
  {} 59

# histogram_quantile with NaN phi: rank = NaN satisfies no bucket, so
# Go's sort.Search lands on len-1 and the SECOND-HIGHEST bound comes
# back (quantile.go:87-92) — not NaN, and certainly not a crash
eval instant at 50m histogram_quantile((0/0), hq)
  {} 1
""")
  }

  // ---- upstream testdata corpus slices ----------------------------------
  // Reconstructions of the upstream `promql/testdata/*.test` shapes
  // through the vendored harness grammar (`promql/test.go:36-193`),
  // adjusted where the vendored VINTAGE diverges from the modern files
  // (noted inline): shouldDropMetricName lists only + - * / %, so bool
  // comparisons and ^ KEEP the metric name here.

  test("upstream operators.test slice: the 8-series http_requests fixture") {
    run("""
load 5m
  http_requests{job="api-server", instance="0", group="production"} 0+10x10
  http_requests{job="api-server", instance="1", group="production"} 0+20x10
  http_requests{job="api-server", instance="0", group="canary"} 0+30x10
  http_requests{job="api-server", instance="1", group="canary"} 0+40x10
  http_requests{job="app-server", instance="0", group="production"} 0+50x10
  http_requests{job="app-server", instance="1", group="production"} 0+60x10
  http_requests{job="app-server", instance="0", group="canary"} 0+70x10
  http_requests{job="app-server", instance="1", group="canary"} 0+80x10

eval instant at 50m sum(http_requests) by (job)
  {job="api-server"} 1000
  {job="app-server"} 2600

eval instant at 50m sum(http_requests{instance="0"}) by (group)
  {group="canary"} 1000
  {group="production"} 600

eval instant at 50m sum(http_requests) by (job) + min(http_requests) by (job)
  {job="api-server"} 1100
  {job="app-server"} 3100

eval instant at 50m sum(http_requests) by (job) - count(http_requests) by (job)
  {job="api-server"} 996
  {job="app-server"} 2596

eval instant at 50m 2 - sum(http_requests) by (job)
  {job="api-server"} -998
  {job="app-server"} -2598

eval instant at 50m sum(http_requests) by (job) / min(http_requests) by (job)
  {job="api-server"} 10
  {job="app-server"} 5.2

eval instant at 50m http_requests{group="canary"} and http_requests{instance="0"}
  http_requests{group="canary", instance="0", job="api-server"} 300
  http_requests{group="canary", instance="0", job="app-server"} 700

eval instant at 50m (http_requests{group="canary"} + 1) and http_requests{instance="0"}
  {group="canary", instance="0", job="api-server"} 301
  {group="canary", instance="0", job="app-server"} 701

eval instant at 50m http_requests{group="canary"} unless http_requests{instance="0"}
  http_requests{group="canary", instance="1", job="api-server"} 400
  http_requests{group="canary", instance="1", job="app-server"} 800

eval instant at 50m http_requests{job="api-server", group="canary"} % 3
  {job="api-server", instance="0", group="canary"} 0
  {job="api-server", instance="1", group="canary"} 1

eval instant at 50m http_requests{group="canary", instance="0"} offset 5m
  http_requests{group="canary", instance="0", job="api-server"} 270
  http_requests{group="canary", instance="0", job="app-server"} 630

# set ops on scalars are type errors (parse.go typecheck)
eval_fail instant at 50m 1 and 1

eval_fail instant at 50m http_requests or 2
""")
  }

  test("upstream operators.test slice: group_left/group_right with " +
      "on/ignoring and include labels") {
    run("""
load 5m
  node_var{instance="abc",job="node"} 2
  node_role{instance="abc",job="node",role="prometheus"} 1
  node_cpu{instance="abc",job="node",mode="idle"} 3
  node_cpu{instance="abc",job="node",mode="user"} 8
  node_cpu{instance="def",job="node",mode="idle"} 8
  node_cpu{instance="def",job="node",mode="user"} 2

# many side keeps its labels; group_x(role) copies role from the one side
eval instant at 5m node_role * on (instance) group_right (role) node_var
  {instance="abc",job="node",role="prometheus"} 2

eval instant at 5m node_var * on (instance) group_left (role) node_role
  {instance="abc",job="node",role="prometheus"} 2

eval instant at 5m node_var * ignoring (role) group_left (role) node_role
  {instance="abc",job="node",role="prometheus"} 2

eval instant at 5m node_role * ignoring (role) group_right (role) node_var
  {instance="abc",job="node",role="prometheus"} 2

# share-of-instance: the canonical group_left against an aggregate
eval instant at 5m node_cpu / on (instance) group_left sum by (instance,job) (node_cpu)
  {instance="abc",job="node",mode="idle"} 0.2727272727272727
  {instance="abc",job="node",mode="user"} 0.7272727272727273
  {instance="def",job="node",mode="idle"} 0.8
  {instance="def",job="node",mode="user"} 0.2

# ignoring the extra dimension instead of naming the join keys
eval instant at 5m node_cpu / ignoring (mode) group_left sum without (mode) (node_cpu)
  {instance="abc",job="node",mode="idle"} 0.2727272727272727
  {instance="abc",job="node",mode="user"} 0.7272727272727273
  {instance="def",job="node",mode="idle"} 0.8
  {instance="def",job="node",mode="user"} 0.2
""")
  }

  test("upstream functions.test slice: clamp family, math functions, " +
      "sort_desc ordering") {
    run("""
load 5m
  test_clamp{src="a"} -50
  test_clamp{src="b"} 0
  test_clamp{src="c"} 100
  http_requests{job="api",instance="0"} 0+10x10
  http_requests{job="api",instance="1"} 0+20x10
  http_requests{job="app",instance="0"} 0+30x10
  http_requests{job="app",instance="1"} 0+40x10

eval instant at 5m clamp_max(test_clamp, 75)
  {src="a"} -50
  {src="b"} 0
  {src="c"} 75

eval instant at 5m clamp_min(test_clamp, -25)
  {src="a"} -25
  {src="b"} 0
  {src="c"} 100

eval instant at 5m clamp_max(clamp_min(test_clamp, -20), 70)
  {src="a"} -20
  {src="b"} 0
  {src="c"} 70

eval instant at 5m abs(test_clamp)
  {src="a"} 50
  {src="b"} 0
  {src="c"} 100

eval instant at 5m floor(test_clamp / 7)
  {src="a"} -8
  {src="b"} 0
  {src="c"} 14

eval instant at 5m ceil(test_clamp / 7)
  {src="a"} -7
  {src="b"} 0
  {src="c"} 15

eval instant at 5m sqrt(abs(test_clamp))
  {src="a"} 7.0710678118654755
  {src="b"} 0
  {src="c"} 10

# Go math.Log2 semantics: log2(0) = -Inf (Spark's log2 would null it)
eval instant at 5m log2(abs(test_clamp))
  {src="a"} 5.643856189774724
  {src="b"} -Inf
  {src="c"} 6.643856189774724

eval_ordered instant at 50m sort_desc(http_requests)
  http_requests{job="app",instance="1"} 400
  http_requests{job="app",instance="0"} 300
  http_requests{job="api",instance="1"} 200
  http_requests{job="api",instance="0"} 100

eval_ordered instant at 50m sort(http_requests)
  http_requests{job="api",instance="0"} 100
  http_requests{job="api",instance="1"} 200
  http_requests{job="app",instance="0"} 300
  http_requests{job="app",instance="1"} 400
""")
  }

  test("upstream operators.test slice: one-to-one vector matching") {
    run("""
load 5m
  vector_matching_a{l="x"} 0+1x100
  vector_matching_a{l="y"} 0+2x50
  vector_matching_b{l="x"} 0+4x25

eval instant at 50m vector_matching_a + vector_matching_a
  {l="x"} 20
  {l="y"} 40

eval instant at 50m vector_matching_a * 2
  {l="x"} 20
  {l="y"} 40

eval instant at 50m vector_matching_a + vector_matching_b
  {l="x"} 50

# filter comparison: 10 == 40 is false, so the matched pair drops out
eval instant at 50m vector_matching_a == vector_matching_b

eval instant at 50m vector_matching_a != vector_matching_b
  vector_matching_a{l="x"} 10

# VINTAGE divergence from the modern corpus: bool comparisons keep the
# lhs metric name (shouldDropMetricName lists only + - * / %); the
# modern files expect a nameless {l="x"} here
eval instant at 50m vector_matching_a == bool vector_matching_b
  vector_matching_a{l="x"} 0

eval instant at 50m vector_matching_a < bool vector_matching_b
  vector_matching_a{l="x"} 1

# == as a FILTER: 10 == 40 is false, so l="x" drops out entirely
eval instant at 50m vector_matching_a == 10
  vector_matching_a{l="x"} 10

eval instant at 50m vector_matching_a % vector_matching_b
  {l="x"} 10
""")
  }

  test("upstream functions.test slice: resets, changes, irate") {
    run("""
load 5m
  http_requests{path="/foo"} 1 2 3 0 1 0 0 1 2 0
  http_requests{path="/bar"} 1 2 3 4 5 1 2 3 4 5
  http_requests{path="/biz"} 0 0 0 0 0 1 1 1 1 1

eval instant at 50m resets(http_requests[50m])
  {path="/foo"} 3
  {path="/bar"} 1
  {path="/biz"} 0

eval instant at 50m resets(http_requests[20m])
  {path="/foo"} 1
  {path="/bar"} 0
  {path="/biz"} 0

eval instant at 50m changes(http_requests[50m])
  {path="/foo"} 8
  {path="/bar"} 9
  {path="/biz"} 1

eval instant at 50m changes(http_requests[20m])
  {path="/foo"} 3
  {path="/bar"} 3
  {path="/biz"} 0

clear

load 5m
  http_total 0 10 20 30 40 50 60 70 80 90 100

eval instant at 50m irate(http_total[30m])
  {} 0.033333333

eval instant at 50m idelta(http_total[30m])
  {} 10
""")
  }

  test("upstream histograms.test slice: the positive/negative fixture") {
    run("""
load 5m
  testhistogram_bucket{le="0.1", start="positive"} 0+5x10
  testhistogram_bucket{le=".2", start="positive"} 0+7x10
  testhistogram_bucket{le="1e0", start="positive"} 0+11x10
  testhistogram_bucket{le="+Inf", start="positive"} 0+12x10
  testhistogram_bucket{le="-.2", start="negative"} 0+1x10
  testhistogram_bucket{le="-0.1", start="negative"} 0+2x10
  testhistogram_bucket{le="0.3", start="negative"} 0+2x10
  testhistogram_bucket{le="+Inf", start="negative"} 0+3x10

# raw cumulative counts at 50m: positive 50/70/110/120,
# negative 10/20/20/30
eval instant at 50m histogram_quantile(0.5, testhistogram_bucket)
  {start="positive"} 0.15
  {start="negative"} -0.15

eval instant at 50m histogram_quantile(0, testhistogram_bucket)
  {start="positive"} 0
  {start="negative"} -0.2

eval instant at 50m histogram_quantile(1, testhistogram_bucket)
  {start="positive"} 1
  {start="negative"} 0.3

# quantiles over rate(): every bucket shares the same extrapolation
# factor, so the relative ranks — and the quantiles — match the raw
# fixture exactly (the upstream file's values)
eval instant at 50m histogram_quantile(0.2, rate(testhistogram_bucket[5m]))
  {start="positive"} 0.048
  {start="negative"} -0.2

eval instant at 50m histogram_quantile(0.8, rate(testhistogram_bucket[5m]))
  {start="positive"} 0.72
  {start="negative"} 0.3
""")
  }

  test("label_replace expands templates like Go regexp.Expand") {
    run("""
load 5m
  lr{src="source-value-10", dst="original"} 0

# out-of-range capture group expands to EMPTY (regexp.ExpandString,
# functions.go:806) and an empty result REMOVES dst — Java's
# replaceFirst would throw IndexOutOfBounds here
eval instant at 0m label_replace(lr, "dst", "$5", "src", "source-value-(.*)")
  lr{src="source-value-10"} 0

# $$ is a literal dollar
eval instant at 0m label_replace(lr, "dst", "$$", "src", ".*")
  lr{src="source-value-10", dst="$"} 0

# $1x parses as the (absent) NAMED group "1x" -> empty -> dst removed
eval instant at 0m label_replace(lr, "dst", "$1x", "src", "source-value-(.*)")
  lr{src="source-value-10"} 0

# ${1}x pins the group explicitly
eval instant at 0m label_replace(lr, "dst", "${1}x", "src", "source-value-(.*)")
  lr{src="source-value-10", dst="10x"} 0

# a trailing $ with no name stays raw text
eval instant at 0m label_replace(lr, "dst", "x$", "src", ".*")
  lr{src="source-value-10", dst="x$"} 0

# leading-zero "group" is a named lookup, not index 5 -> empty -> drop
eval instant at 0m label_replace(lr, "dst", "$05", "src", "source-value-(.*)")
  lr{src="source-value-10"} 0

# non-participating alternation branch expands empty -> dst removed
eval instant at 0m label_replace(lr, "dst", "$2", "src", "(source)-value-10|(zzz)")
  lr{src="source-value-10"} 0
""")
  }

  test("upstream literals.test slice: number forms") {
    run("""
load 5m
  dummy 0

eval instant at 50m 12.34e6
  {} 12340000

eval instant at 50m 12.34e+6
  {} 12340000

eval instant at 50m 12.34e-6
  {} 0.00001234

eval instant at 50m 0x12
  {} 18

eval instant at 50m 1e3
  {} 1000

eval instant at 50m -1
  {} -1

eval instant at 50m Inf
  {} Inf

eval instant at 50m -Inf
  {} -Inf

eval instant at 50m NaN
  {} NaN

eval instant at 50m Inf - Inf
  {} NaN

eval instant at 50m 1 / 0
  {} Inf

eval instant at 50m -1 / 0
  {} -Inf

eval instant at 50m 0 / 0
  {} NaN
""")
  }

  test("vintage guards: topk k<1 empty, scalar-comparison BOOL, without ()") {
    run("""
load 5m
  m{i="a"} 0+10x10
  m{i="b"} 0+20x10

# engine.go:1259-1262 — non-positive k is an EMPTY vector, not an error
eval instant at 50m topk(0, m)

eval instant at 50m topk(-3, m)

eval instant at 50m bottomk(0, m)

# the param is any constant scalar expression (evalInt); the
# data-independent scalar(vector(c)) shape folds
eval instant at 50m topk(scalar(vector(1)), m)
  m{i="b"} 200

# aggregating an empty vector yields an empty vector, not a 0 row
eval instant at 50m sum(nonexistent)

# parse.go:518-531 — comparisons between scalars must use BOOL
eval_fail instant at 50m 1 < 2

eval instant at 50m 1 < bool 2
  {} 1

eval instant at 50m 1 >= bool 2
  {} 0

# scalar-vector comparison with bool KEEPS the metric name in this
# vintage (shouldDropMetricName lists only + - * / %)
eval instant at 50m m > bool 150
  m{i="a"} 0
  m{i="b"} 1

# `without ()` with an empty label list still drops __name__
eval instant at 50m sum without () (m)
  {i="a"} 100
  {i="b"} 200
""")
  }

  test("upstream selectors/aggregators slice: absent, bottomk, stddev by") {
    run("""
load 5m
  http_requests{job="api-server", instance="0", group="production"} 0+10x10
  http_requests{job="api-server", instance="1", group="production"} 0+20x10
  http_requests{job="app-server", instance="0", group="production"} 0+50x10
  http_requests{job="app-server", instance="1", group="production"} 0+60x10

eval instant at 50m absent(nonexistent)
  {} 1

eval instant at 50m absent(nonexistent{job="myjob", instance="123"})
  {job="myjob", instance="123"} 1

eval instant at 50m absent(http_requests)

eval instant at 50m bottomk(1, http_requests)
  http_requests{job="api-server", instance="0", group="production"} 100

eval instant at 50m bottomk(2, http_requests)
  http_requests{job="api-server", instance="0", group="production"} 100
  http_requests{job="api-server", instance="1", group="production"} 200

eval instant at 50m stddev(http_requests) by (job)
  {job="api-server"} 50
  {job="app-server"} 50

eval instant at 50m stdvar(http_requests) by (job)
  {job="api-server"} 2500
  {job="app-server"} 2500

eval instant at 50m avg(http_requests) by (job)
  {job="api-server"} 150
  {job="app-server"} 550

eval instant at 50m max(http_requests) by (instance)
  {instance="0"} 500
  {instance="1"} 600

eval instant at 50m count_values("version", http_requests)
  {version="100"} 1
  {version="200"} 1
  {version="500"} 1
  {version="600"} 1
""")
  }

  test("upstream aggregators.test slice: by/without over the full fixture") {
    run("""
load 5m
  http_requests{job="api-server", instance="0", group="production"} 0+10x10
  http_requests{job="api-server", instance="1", group="production"} 0+20x10
  http_requests{job="api-server", instance="0", group="canary"} 0+30x10
  http_requests{job="api-server", instance="1", group="canary"} 0+40x10
  http_requests{job="app-server", instance="0", group="production"} 0+50x10
  http_requests{job="app-server", instance="1", group="production"} 0+60x10
  http_requests{job="app-server", instance="0", group="canary"} 0+70x10
  http_requests{job="app-server", instance="1", group="canary"} 0+80x10

# aggregation keywords are case-insensitive (lex.go:853 lowercases
# before the keyword lookup), and parens nest freely
eval instant at 50m SUM BY (group) (http_requests{job="api-server"})
  {group="canary"} 700
  {group="production"} 300

eval instant at 50m sum by (group) (((http_requests{job="api-server"})))
  {group="canary"} 700
  {group="production"} 300

eval instant at 50m sum without (instance) (http_requests{job="api-server"})
  {group="canary", job="api-server"} 700
  {group="production", job="api-server"} 300

eval instant at 50m avg by (group) (http_requests{job="api-server"})
  {group="canary"} 350
  {group="production"} 150

eval instant at 50m count by (group) (http_requests{job="api-server"})
  {group="canary"} 2
  {group="production"} 2

eval instant at 50m min by (group) (http_requests{job="api-server"})
  {group="canary"} 300
  {group="production"} 100

eval instant at 50m max by (group) (http_requests{job="api-server"})
  {group="canary"} 400
  {group="production"} 200

# population stddev/stdvar over all 8 series: mean 450, Σd²/8 = 52500
eval instant at 50m stddev(http_requests)
  {} 229.12878474779
eval instant at 50m stdvar(http_requests)
  {} 52500

# topk/bottomk keep the full original series labels incl. the name
eval instant at 50m topk(3, http_requests)
  http_requests{group="canary", instance="1", job="app-server"} 800
  http_requests{group="canary", instance="0", job="app-server"} 700
  http_requests{group="production", instance="1", job="app-server"} 600

eval instant at 50m topk by (group) (1, http_requests)
  http_requests{group="canary", instance="1", job="app-server"} 800
  http_requests{group="production", instance="1", job="app-server"} 600

eval instant at 50m bottomk(3, http_requests)
  http_requests{group="production", instance="0", job="api-server"} 100
  http_requests{group="production", instance="1", job="api-server"} 200
  http_requests{group="canary", instance="0", job="api-server"} 300

# exact interpolated quantile: rank 0.9*(4-1)=2.7 within each job
eval instant at 50m quantile by (job) (0.9, http_requests)
  {job="api-server"} 370
  {job="app-server"} 770

# aggregating a nonexistent metric yields an empty vector
eval instant at 50m sum(nonexistent)
""")
  }

  test("upstream functions.test slice: date functions on pinned epochs") {
    run("""
load 5m
  metric 1454284800
  labeled{l="x"} 1454284800

# 1454284800 = 2016-02-01T00:00:00Z, a Monday in a leap-year February;
# the functions read the VALUE as epoch seconds (functions.go:886-895)
eval instant at 0m year(metric)
  {} 2016

eval instant at 0m month(metric)
  {} 2

eval instant at 0m day_of_month(metric)
  {} 1

# Sunday = 0 convention: Monday is 1
eval instant at 0m day_of_week(metric)
  {} 1

eval instant at 0m hour(metric)
  {} 0

eval instant at 0m minute(metric)
  {} 0

eval instant at 0m days_in_month(metric)
  {} 29

# non-leap February
eval instant at 0m days_in_month(vector(1422748800))
  {} 28

# 31- and 30-day months (2016-01-01, 2016-04-01)
eval instant at 0m days_in_month(vector(1451606400))
  {} 31

eval instant at 0m days_in_month(vector(1459468800))
  {} 30

# labels survive, the metric name does not
eval instant at 0m month(labeled)
  {l="x"} 2

# zero-arg forms read the evaluation time
eval instant at 0m month()
  {} 1

eval instant at 0m day_of_week()
  {} 4

# fractional epochs floor toward the earlier second (Go time.Unix
# truncation on the int64 cast)
eval instant at 0m minute(vector(59.8))
  {} 0
""")
  }

  test("upstream functions.test slice: ceil/exp/sqrt/log2/log10 on " +
      "exactly-representable points") {
    // points chosen so Go and the JVM agree bit-for-bit: IEEE sqrt is
    // correctly rounded by spec, powers of two are exact in log2, and
    // the 0/negative/overflow edges are fixed constants
    run("""
load 5m
  m{x="neg"} -4
  m{x="zero"} 0
  m{x="sq"} 64
  m{x="half"} -0.5
  m{x="big"} 1000

eval instant at 0m sqrt(m)
  {x="neg"} NaN
  {x="zero"} 0
  {x="sq"} 8
  {x="half"} NaN
  {x="big"} 31.622776601683793

eval instant at 0m log2(m)
  {x="neg"} NaN
  {x="zero"} -Inf
  {x="sq"} 6
  {x="half"} NaN
  {x="big"} 9.965784284662087

eval instant at 0m log10(vector(1))
  {} 0

eval instant at 0m log10(vector(0))
  {} -Inf

eval instant at 0m log10(vector(-1))
  {} NaN

eval instant at 0m exp(vector(0))
  {} 1

# e^1000 overflows to +Inf; e^-Inf is exactly 0
eval instant at 0m exp(m{x="big"})
  {x="big"} +Inf

eval instant at 0m exp(ln(vector(0)))
  {} 0

# ceil/floor straddle: Go returns -0 for ceil(-0.5), == 0
eval instant at 0m ceil(m{x="half"})
  {x="half"} 0

eval instant at 0m floor(m{x="half"})
  {x="half"} -1
""")
  }

  test("upstream staleness.test slice: lookback expiry boundary") {
    run("""
load 10s
  metric 0 1 stale 2

eval instant at 0s metric
  metric 0

eval instant at 10s metric
  metric 1

# the marker at 20s hides the series without resurrecting older points
eval instant at 20s metric

eval instant at 30s metric
  metric 2

eval instant at 40s metric
  metric 2

# the last point stays selectable through the CLOSED 5-minute
# lookback window (engine.go:789-806 selects st >= t - 300000)...
eval instant at 330s metric
  metric 2

# ...and expires one second past it
eval instant at 331s metric
""")
  }

  test("precedence torture (parse.go:442-545): right-assoc pow, vintage " +
      "unary fold, comparison/set layering") {
    run("""
load 5m
  pm{k="a"} 0+10x10

# ^ is RIGHT-associative (lex.go:114-121): 2^(3^2), not (2^3)^2
eval instant at 50m 2 ^ 3 ^ 2
  {} 512

# vintage unaryExpr folds the sign INTO a number literal before the
# binop loop runs (parse.go:552-558), so -1^2 is (-1)^2 — the modern
# grammar's -(1^2) reading postdates this vintage
eval instant at 50m -1 ^ 2
  {} 1

# same fold on the right operand: 2^(-1)
eval instant at 50m 2 ^ -1
  {} 0.5

# a parenthesized operand defeats the literal fold but the unary node
# still binds before the binop loop sees ^
eval instant at 50m -(1) ^ 2
  {} 1

eval instant at 50m 2 + 3 * 4 ^ 2
  {} 50

# same-precedence * / % associate LEFT
eval instant at 50m 100 / 10 % 3
  {} 1

# Go math.Mod: result carries the DIVIDEND's sign
eval instant at 50m (0 - 10) % 3
  {} -1

# comparisons sit below arithmetic: both sides reduce first
eval instant at 50m 1 < bool 2 + 3
  {} 1

eval instant at 50m 4 >= bool 2 * 2
  {} 1

eval instant at 50m pm * 2 ^ 2
  {k="a"} 400

# comparison filters keep the metric name; or merges the survivors
eval instant at 50m pm > 50 or pm < 20
  pm{k="a"} 100
""")
  }

  test("staleness markers drop from range-selector windows but hide " +
      "instant selections") {
    run("""
load 1m
  sf 0 1 2 stale 4 5

# closed [0m,5m] window: five real points, the marker is not a sample
eval instant at 5m count_over_time(sf[5m])
  {} 5

# window straddling the marker sums only the real points
eval instant at 4m sum_over_time(sf[2m])
  {} 6

eval instant at 3m avg_over_time(sf[3m])
  {} 1

eval instant at 5m max_over_time(sf[5m])
  {} 5

# the same timestamp as an INSTANT selection: marker is newest -> hidden
eval instant at 3m sf

eval instant at 4m sf
  sf 4
""")
  }

  test("staleness interacts with offset: the marker hides the " +
      "OFFSET-SHIFTED lookback, and absent() sees the hidden series") {
    run("""
load 1m
  so 0 1 stale 3

# shifted evaluation time 2m: the marker is the newest lookback point
eval instant at 12m so offset 10m

eval instant at 12m absent(so offset 10m)
  {} 1

eval instant at 12m sum(so offset 10m)

# one minute later the 3m sample is newest again
eval instant at 13m so offset 10m
  so 3

# range windows behind offset drop the marker like any other window
eval instant at 13m count_over_time(so[3m] offset 10m)
  {} 3
""")
  }

  test("histogram_quantile golden edges: out-of-range q, missing +Inf, " +
      "q=0/q=1 bounds, non-monotone envelope") {
    run("""
load 5m
  hq{le="0.1"} 0+5x10
  hq{le="1"} 0+8x10
  hq{le="+Inf"} 0+10x10
  hn{le="1"} 0+5x10
  hn{le="2"} 0+10x10
  hs{le="+Inf"} 0+10x10
  hm{le="1"} 30+0x10
  hm{le="2"} 20+0x10
  hm{le="+Inf"} 40+0x10

eval instant at 50m histogram_quantile(1.5, hq)
  {} Inf

eval instant at 50m histogram_quantile(-1, hq)
  {} -Inf

# q=1: rank equals the +Inf count, the search lands past every inner
# bucket and returns the HIGHEST FINITE le (quantile.go:75-83)
eval instant at 50m histogram_quantile(1, hq)
  {} 1

# q=0 interpolates to the lower edge of the first bucket
eval instant at 50m histogram_quantile(0, hq)
  {} 0

# no +Inf bucket -> NaN
eval instant at 50m histogram_quantile(0.9, hn)
  {} NaN

# a lone +Inf bucket is fewer than the 2-bucket minimum -> NaN
eval instant at 50m histogram_quantile(0.9, hs)
  {} NaN

# ensureMonotonic raises the sagging inner bucket (20 -> 30) and the
# rank-20 search then resolves inside the FIRST bucket
eval instant at 50m histogram_quantile(0.5, hm)
  {} 0.666667
""")
  }

  test("extrapolated rate boundaries: counter zero-clamp vs delta, " +
      "closed-window sample inclusion") {
    run("""
load 10s
  bd 0 1 2 3

# closed [10s,20s]: BOTH boundary samples are in (engine.go:789-806)
eval instant at 20s count_over_time(bd[10s])
  {} 2

eval instant at 20s count_over_time(bd[20s])
  {} 3

eval instant at 20s count_over_time(bd[1s])
  {} 1

# a single in-window point cannot produce a delta
eval instant at 20s delta(bd[1s])

clear

load 5m
  zc _ _ _ _ _ 1+10x5
  nc _ _ _ _ _ 100+10x5

# counter starting near zero: the zero-crossing clamp shortens the
# start extrapolation to durationToZero = 1500s*(1/50) = 30s, so
# increase = 50 * (1500+30)/1500 (functions.go:85-97)
eval instant at 50m increase(zc[50m])
  {} 51

# delta has no zero clamp: start extrapolation falls back to half the
# average interval (150s) -> 50 * (1500+150)/1500
eval instant at 50m delta(zc[50m])
  {} 55

# a large starting value puts the zero crossing beyond the window, so
# increase extrapolates exactly like delta
eval instant at 50m increase(nc[50m])
  {} 55

eval instant at 50m rate(zc[50m])
  {} 0.017
""")
  }

  test("vector-matching label algebra: on/ignoring result labels, " +
      "group_left include, set ops with on()") {
    run("""
load 5m
  lft{k="a", e="x"} 0+10x10
  lft{k="b", e="y"} 0+20x10
  rgt{k="a", side="r"} 2+0x10
  rgt{k="b", side="s"} 4+0x10

# many-to-one keeps the MANY side's labels (minus __name__)
eval instant at 50m lft * on(k) group_left rgt
  {k="a", e="x"} 200
  {k="b", e="y"} 800

# group_left(side) additionally copies the named label from the one side
eval instant at 50m lft * on(k) group_left(side) rgt
  {k="a", e="x", side="r"} 200
  {k="b", e="y", side="s"} 800

# one-to-one with ignoring DROPS the ignored labels from the result
eval instant at 50m lft / ignoring(e, side) rgt
  {k="a"} 50
  {k="b"} 50

# set ops keep the LHS samples verbatim, metric name included
eval instant at 50m lft and on(k) rgt
  lft{k="a", e="x"} 100
  lft{k="b", e="y"} 200

eval instant at 50m lft unless on(k) rgt{side="r"}
  lft{k="b", e="y"} 200
""")
  }

  test("time/timestamp/scalar interplay on pinned sample timestamps") {
    run("""
load 5m
  tm 1 2 3

# timestamp() reports the SAMPLE's time in seconds, not the eval time
eval instant at 12m timestamp(tm)
  {} 600

# offset shifts which sample is newest before timestamp() reads it
eval instant at 12m timestamp(tm offset 5m)
  {} 300

eval instant at 12m time()
  {} 720

eval instant at 12m vector(time())
  {} 720

eval instant at 12m scalar(tm)
  {} 3

eval instant at 12m tm * time()
  {} 2160
""")
  }

  test("regex matchers are fully anchored (vintage ^(?:re)$ wrap)") {
    run("""
load 5m
  rx{s="aa"} 1+0x10
  rx{s="ab"} 2+0x10
  rx{s="b"} 3+0x10

eval instant at 50m rx{s=~"a+"}
  rx{s="aa"} 1

eval instant at 50m rx{s=~"a."}
  rx{s="aa"} 1
  rx{s="ab"} 2

# anchoring wraps the WHOLE alternation: ^(?:a|b)$ matches only "b"
eval instant at 50m rx{s=~"a|b"}
  rx{s="b"} 3

eval instant at 50m rx{s!~"a+"}
  rx{s="ab"} 2
  rx{s="b"} 3

eval_fail instant at 50m rx{s=~"(a"}

# RE2 inline flags are in the Java-regex common subset: (?i) applies
# case-insensitivity inside the anchored wrap. (Full RE2 parity is
# not total — Java additionally accepts backreferences RE2 rejects —
# but every RE2-legal pattern behaves identically here.)
eval instant at 50m rx{s=~"(?i)AA"}
  rx{s="aa"} 1

eval instant at 50m rx{s=~"(?i)a[AB]"}
  rx{s="aa"} 1
  rx{s="ab"} 2
""")
  }

  test("RE2 class literals and Unicode case folding (matcher.go " +
      "NewMatcher dialect edges)") {
    run("""
load 5m
  rc{s="["} 1+0x10
  rc{s="&"} 2+0x10
  rc{s="a"} 3+0x10
  rc{s="Σ"} 4+0x10

# '[' inside a class is a LITERAL in RE2 (Java alone would open a
# nested class / throw Unclosed character class on [[])
eval instant at 50m rc{s=~"[[]"}
  rc{s="["} 1

eval instant at 50m rc{s=~"[a[b]"}
  rc{s="["} 1
  rc{s="a"} 3

# '&&' inside a class is two literal '&'s in RE2, not intersection
eval instant at 50m rc{s=~"[a&&b]"}
  rc{s="&"} 2
  rc{s="a"} 3

# RE2's (?i) case-folds in Unicode: σ matches Σ
eval instant at 50m rc{s=~"(?i)σ"}
  rc{s="Σ"} 4

# repetition counts above RE2's 1000 cap are a parse error
eval_fail instant at 50m rc{s=~"a{1001}"}

eval_fail instant at 50m rc{s=~"a{2,100000}"}

eval instant at 50m rc{s=~"a{1,1000}"}
  rc{s="a"} 3
""")
  }

  test("typecheck failures the vintage parser rejects (parse.go " +
      "checkType, offset/range placement)") {
    run("""
load 5m
  foo 0+10x10

eval_fail instant at 50m rate(foo)

eval_fail instant at 50m foo[5m] + 1

eval_fail instant at 50m sum(foo) offset 5m

eval_fail instant at 50m topk(foo, 2)

eval_fail instant at 50m 1 and 2

eval_fail instant at 50m foo and scalar(foo)

eval_fail instant at 50m histogram_quantile(0.9, foo[5m])

# modern-grammar shapes this vintage must REJECT: subquery ranges,
# the @ modifier, and negative offsets all postdate it
eval_fail instant at 50m rate(foo[5m:1m])

eval_fail instant at 50m foo @ 1500

eval_fail instant at 50m foo offset -5m

# modifier misuse (parse.go:466-469, 1060-1079): bool off comparisons,
# grouping on set operators, vector matching against a scalar
eval_fail instant at 50m foo and bool foo

eval_fail instant at 50m foo + bool foo

eval_fail instant at 50m foo and on(job) group_left foo

eval_fail instant at 50m foo unless group_right(job) foo

eval_fail instant at 50m foo + on(job) 1

eval_fail instant at 50m 1 == bool on(job) foo
""")
  }

  test("rate family with a NaN mid-window: Go comparisons are false " +
      "with NaN, so it is NOT a counter reset") {
    run("""
load 5m
  rn 0 5 NaN 10 15

# the NaN sample adds no counterCorrection (5 < NaN and NaN < 10 are
# both false in Go — functions.go:70-75), so increase is last − first
# with both boundary extrapolations zero (samples sit on the bounds)
eval instant at 20m increase(rn[20m])
  {} 15

eval instant at 20m delta(rn[20m])
  {} 15

eval instant at 20m rate(rn[20m])
  {} 0.0125

# resets: same false comparisons — zero resets across the NaN
eval instant at 20m resets(rn[20m])
  {} 0

# irate at the window end sees (10, 15): finite, no reset
eval instant at 20m irate(rn[20m])
  {} 0.016666667

# but an irate whose newest pair INCLUDES the NaN propagates it:
# 10 < NaN is false -> plain difference NaN - 5 = NaN
eval instant at 10m irate(rn[10m])
  {} NaN
""")
  }

  test("counter-function NaN transitions and the irate reset branch " +
      "(functions.go:154-177,731-776)") {
    run("""
load 5m
  cn 1 NaN NaN 1 2
  cr 5 3 NaN 2 4

# changes counts X->NaN and NaN->X but never NaN->NaN
# (current != prev is TRUE for NaN pairs in IEEE; the explicit
# both-NaN guard is what excludes them)
eval instant at 20m changes(cn[20m])
  {} 3

eval instant at 20m changes(cr[20m])
  {} 4

# resets uses current < prev, which is false whenever NaN is involved
eval instant at 20m resets(cn[20m])
  {} 0

eval instant at 20m resets(cr[20m])
  {} 1

clear

load 5m
  ir 10 20 5

# irate sees last(5) < prev(20): counter reset -> the raw last value
# over the 300s gap, NOT the negative diff
eval instant at 10m irate(ir[15m])
  {} 0.016666667

# idelta has no reset branch: plain difference
eval instant at 10m idelta(ir[15m])
  {} -15
""")
  }

  test("function argument edges: quantile_over_time bounds and " +
      "interpolation, holt_winters guards, flat-series regressions") {
    run("""
load 5m
  qv 10 20 30 40
  cst 7 7 7 7 7 7 7 7 7 7 7

eval instant at 15m quantile_over_time(-1, qv[15m])
  {} -Inf

eval instant at 15m quantile_over_time(2, qv[15m])
  {} Inf

# rank = q*(n-1): 0.25*3 = 0.75 -> 10*(1-0.75) + 20*0.75
eval instant at 15m quantile_over_time(0.25, qv[15m])
  {} 17.5

eval instant at 15m quantile_over_time(0.5, qv[15m])
  {} 25

# holt_winters demands 0 < sf < 1 and 0 < tf < 1 (functions.go:227-232)
eval_fail instant at 15m holt_winters(qv[15m], 2, 0.1)

eval_fail instant at 15m holt_winters(qv[15m], 0.1, 1)

eval_fail instant at 15m holt_winters(qv[15m], 0, 0.5)

# a perfectly flat series regresses to slope 0 / its own value
eval instant at 50m deriv(cst[50m])
  {} 0

eval instant at 50m predict_linear(cst[50m], 3600)
  {} 7

# the AGGREGATION quantile shares quantile.go:161-171's bounds:
# q<0 -> -Inf, q>1 -> +Inf, never an error
eval instant at 50m quantile(-0.5, cst)
  {} -Inf

eval instant at 50m quantile(1.5, cst)
  {} Inf
""")
  }

  test("aggregation params are full scalar EXPRESSIONS, and by " +
      "(__name__) groups on the reserved label") {
    run("""
load 5m
  tp{s="a"} 10+0x10
  tp{s="b"} 30+0x10
  tp{s="c"} 20+0x10

# the vendored engine evaluates the param with evalFloat/evalInt over
# an arbitrary scalar expression, not just a literal
eval instant at 50m topk(1+1, tp)
  tp{s="b"} 30
  tp{s="c"} 20

eval instant at 50m topk(scalar(vector(2)), tp)
  tp{s="b"} 30
  tp{s="c"} 20

eval instant at 50m quantile(scalar(vector(0.5)), tp)
  {} 20

eval instant at 50m quantile(0.1*5, tp)
  {} 20

# __name__ is an ordinary grouping label to `by`: the result KEEPS it
eval instant at 50m sum by (__name__) (tp)
  tp 60
""")
  }

  test("absent of non-selector args, scientific-notation le buckets, " +
      "label_join with missing sources, single-sample spreads") {
    run("""
load 5m
  lm{a="x"} 1+0x10
  hs2{le="5e2"} 30+0x10
  hs2{le="1e3"} 60+0x10
  hs2{le="+Inf"} 100+0x10
  one 7

# absent() derives labels only from a PLAIN selector argument; any
# other expression shape yields the bare {} 1
eval instant at 50m absent(sum(nonexistent))
  {} 1

eval instant at 50m absent(nonexistent + on() vector(0))
  {} 1

# le values parse as Go floats: "5e2" and "1e3" are the 500/1000
# bucket bounds (rank 0.5*100=50 -> second bucket, interpolated
# 500 + 500*(50-30)/30)
eval instant at 50m histogram_quantile(0.5, hs2)
  {} 833.3333333

# label_join writes the JOINED value including empty strings for
# missing source labels (Go strings.Join, not a null-skipping concat)
# and — unlike arithmetic — KEEPS the metric name
eval instant at 50m label_join(lm, "dst", "-", "a", "nosuch")
  lm{a="x", dst="x-"} 1

eval instant at 50m label_join(lm, "dst", "-", "nosuch", "a")
  lm{a="x", dst="-x"} 1

# population spreads of a single sample are exactly 0
eval instant at 5m stddev_over_time(one[5m])
  {} 0

eval instant at 5m stdvar_over_time(one[5m])
  {} 0

eval instant at 5m avg_over_time(one[5m])
  {} 7

eval instant at 5m quantile_over_time(0.9, one[5m])
  {} 7
""")
  }

  test("sort/sort_desc put NaN at the bottom BOTH ways; clamp " +
      "propagates NaN through Go's math.Min/Max") {
    run("""
load 5m
  sv{s="a"} 30+0x10
  sv{s="b"} 10+0x10
  sv{s="n"} _ _ _ _ _ _ _ _ _ _ NaN

# funcSort/funcSortDesc (functions.go:288-303): both directions are a
# reversed sort with NaN FIRST, so NaN lands at the bottom either way
eval_ordered instant at 50m sort(sv)
  sv{s="b"} 10
  sv{s="a"} 30
  sv{s="n"} NaN

eval_ordered instant at 50m sort_desc(sv)
  sv{s="a"} 30
  sv{s="b"} 10
  sv{s="n"} NaN

# clamp_* is Go math.Min/Max: NaN in -> NaN out (it never "clamps"
# a NaN to the bound), and the metric name drops
eval instant at 50m clamp_max(sv, 20)
  {s="a"} 20
  {s="b"} 10
  {s="n"} NaN

eval instant at 50m clamp_min(sv{s=~"a|n"}, 15)
  {s="a"} 30
  {s="n"} NaN
""")
  }

  test("topk/bottomk NaN ordering and over-wide k") {
    run("""
load 5m
  tk{s="lo"} 0+10x10
  tk{s="hi"} 0+30x10
  tk{s="nan"} _ _ _ _ _ _ _ _ _ _ NaN

# k wider than the series count returns everything
eval instant at 50m topk(10, tk{s=~"lo|hi"})
  tk{s="lo"} 100
  tk{s="hi"} 300

# NaN loses every comparison: at k = n it is included (nothing
# displaces it) but never evicts a real value at k < n
eval instant at 50m topk(3, tk)
  tk{s="lo"} 100
  tk{s="hi"} 300
  tk{s="nan"} NaN

eval instant at 50m topk(2, tk)
  tk{s="lo"} 100
  tk{s="hi"} 300

eval instant at 50m bottomk(1, tk{s=~"lo|hi"})
  tk{s="lo"} 100

# bottomk mirrors topk: NaN loses the comparison both ways, so it is
# included only when k reaches the full set
eval instant at 50m bottomk(3, tk)
  tk{s="lo"} 100
  tk{s="hi"} 300
  tk{s="nan"} NaN

eval instant at 50m bottomk(2, tk)
  tk{s="lo"} 100
  tk{s="hi"} 300

# spread aggregations across series: one NaN poisons the whole group
# (Go float arithmetic, no NaN-skipping)
eval instant at 50m stddev(tk)
  {} NaN

eval instant at 50m stdvar(tk)
  {} NaN

eval instant at 50m stddev(tk{s=~"lo|hi"})
  {} 100

# scalar()/vector() roundtrips: multi-element -> NaN propagates
eval instant at 50m vector(scalar(tk))
  {} NaN

eval instant at 50m vector(scalar(tk{s="lo"}))
  {} 100
""")
  }

  test("per-step series churn: lookback membership, set ops, and " +
      "absent() all re-evaluate at every step (engine.go:767-806)") {
    // a: samples at 0,5,10m then 30,35m (a 15m hole); b: 10..20m only.
    // The set-at-once evaluator must reproduce the reference's
    // per-step membership: a series is present exactly when its
    // latest sample falls in the CLOSED [t-5m, t] lookback.
    run("""
load 5m
  churn{s="a"} 1 2 3 _ _ _ 7 8
  churn{s="b"} _ _ 10 20 30

eval instant at 15m churn
  churn{s="a"} 3
  churn{s="b"} 20

# a's 10m sample ages out of [15m,20m]; b remains
eval instant at 20m churn
  churn{s="b"} 30

# off-grid instant: b's 20m sample still covers 22m
eval instant at 22m churn
  churn{s="b"} 30

# both series outside lookback: empty vector
eval instant at 26m churn

# a returns after its hole, b long gone
eval instant at 30m churn
  churn{s="a"} 7

# aggregations track the per-step membership
eval instant at 15m sum(churn)
  {} 23

eval instant at 20m sum(churn)
  {} 30

eval instant at 30m sum(churn)
  {} 7

eval instant at 15m count(churn)
  {} 2

eval instant at 30m count(churn)
  {} 1

# set ops re-evaluate per step: at 15m both sides exist, at 20m the
# lhs is absent so or falls through to the rhs
eval instant at 15m churn{s="a"} or churn{s="b"}
  churn{s="a"} 3
  churn{s="b"} 20

eval instant at 20m churn{s="a"} or churn{s="b"}
  churn{s="b"} 30

# unless on(): rhs existence is checked at EACH step
eval instant at 15m churn{s="b"} unless on() churn{s="a"}

eval instant at 20m churn{s="b"} unless on() churn{s="a"}
  churn{s="b"} 30

# absent() flips per step with the selection, carrying the
# selector's equality-matcher labels (functions.go funcAbsent)
eval instant at 20m absent(churn{s="a"})
  {s="a"} 1

eval instant at 15m absent(churn{s="a"})

eval instant at 26m absent(churn)
  {} 1

# per-step extrema and bool comparisons follow membership too
# (bool comparisons KEEP __name__ in this vintage —
# shouldDropMetricName lists only arithmetic, engine.go:1460-1467)
eval instant at 15m max(churn)
  {} 20

eval instant at 30m max(churn)
  {} 7

eval instant at 15m churn > bool 15
  churn{s="a"} 0
  churn{s="b"} 1
""")
  }

  test("empty-string matchers select series WITHOUT the label " +
      "(labels.Get of an absent name is \"\", matcher.go:74-88)") {
    run("""
load 5m
  em{env="prod"} 1+0x10
  em{env="dev"} 2+0x10
  em 3+0x10

# equality with "" matches the label-less series only
eval instant at 50m em{env=""}
  em 3

eval instant at 50m em{env!=""}
  em{env="prod"} 1
  em{env="dev"} 2

# =~"" anchors to ^(?:)$ — exactly the empty value, absent included
eval instant at 50m em{env=~""}
  em 3

eval instant at 50m em{env!~""}
  em{env="prod"} 1
  em{env="dev"} 2

# .* matches the empty string too: absent labels are selected
eval instant at 50m em{env=~".*"}
  em{env="prod"} 1
  em{env="dev"} 2
  em 3

# .+ requires at least one character: absent labels are NOT
eval instant at 50m em{env=~".+"}
  em{env="prod"} 1
  em{env="dev"} 2

# optional-suffix patterns that CAN match empty behave like .*
eval instant at 50m em{env=~"(prod)?"}
  em{env="prod"} 1
  em 3

eval instant at 50m em{env!~".+"}
  em 3
""")
  }

  test("character classes: ranges, negation, escapes, and RE2 POSIX " +
      "[[:class:]] spellings (regexp/syntax, parse.go:919-931)") {
    run("""
load 5m
  cc{s="a1"} 1+0x10
  cc{s="b2"} 2+0x10
  cc{s="C3"} 3+0x10
  cc{s="d-4"} 4+0x10
  cc{s="e_5"} 5+0x10

eval instant at 50m cc{s=~"[a-z][0-9]"}
  cc{s="a1"} 1
  cc{s="b2"} 2

# negated class: first char NOT in a-z (anchored, two chars total)
eval instant at 50m cc{s=~"[^a-z][0-9]"}
  cc{s="C3"} 3

# escaped dash and literal dash placement both work
eval instant at 50m cc{s=~"[a-z][-_][0-9]"}
  cc{s="d-4"} 4
  cc{s="e_5"} 5

# RE2 POSIX classes translate to the same US-ASCII sets
eval instant at 50m cc{s=~"[[:lower:]][[:digit:]]"}
  cc{s="a1"} 1
  cc{s="b2"} 2

eval instant at 50m cc{s=~"[[:alpha:]][[:digit:]]"}
  cc{s="a1"} 1
  cc{s="b2"} 2
  cc{s="C3"} 3

# negated-POSIX inside a class
eval instant at 50m cc{s=~"[[:^lower:]][0-9]"}
  cc{s="C3"} 3

# \d and \w shorthand classes
eval instant at 50m cc{s=~"\\w\\d"}
  cc{s="a1"} 1
  cc{s="b2"} 2
  cc{s="C3"} 3

eval instant at 50m cc{s=~"[[:word:]][[:xdigit:]]"}
  cc{s="a1"} 1
  cc{s="b2"} 2
  cc{s="C3"} 3
""")
  }

  test("alternation is anchored as ONE group: ^(?:a|b)$ variants " +
      "(matcher.go:61 wrap semantics)") {
    run("""
load 5m
  alt{s="a"} 1+0x10
  alt{s="ab"} 2+0x10
  alt{s="ba"} 3+0x10
  alt{s="b"} 4+0x10

# the wrap spans the whole alternation, not its first branch
eval instant at 50m alt{s=~"a|b"}
  alt{s="a"} 1
  alt{s="b"} 4

# explicit inner anchors are redundant but harmless under the wrap
eval instant at 50m alt{s=~"^a$|^b$"}
  alt{s="a"} 1
  alt{s="b"} 4

# inner anchors bind to their BRANCH: ^(?:^a|b$)$ still needs the
# branch to cover the whole value
eval instant at 50m alt{s=~"^a|b$"}
  alt{s="a"} 1
  alt{s="b"} 4

# grouping releases the suffix: (a|b)b? covers ab and b and a and bb
eval instant at 50m alt{s=~"(a|b)b?"}
  alt{s="a"} 1
  alt{s="ab"} 2
  alt{s="b"} 4

# negated alternation
eval instant at 50m alt{s!~"a|b"}
  alt{s="ab"} 2
  alt{s="ba"} 3

# alternation with class branches
eval instant at 50m alt{s=~"[ab]|ba"}
  alt{s="a"} 1
  alt{s="ba"} 3
  alt{s="b"} 4
""")
  }

  test("RE2-only named groups (?P<name>…) work in label_replace " +
      "(functions.go:788-812, regexp.Expand)") {
    run("""
load 5m
  src{path="api/users"} 1+0x10
  src{path="web/login"} 2+0x10

eval instant at 50m label_replace(src, "svc", "$1", "path", "(?P<kind>[a-z]+)/.*")
  src{path="api/users", svc="api"} 1
  src{path="web/login", svc="web"} 2

# named reference in the template
eval instant at 50m label_replace(src, "svc", "${kind}", "path", "(?P<kind>[a-z]+)/.*")
  src{path="api/users", svc="api"} 1
  src{path="web/login", svc="web"} 2

# an absent named group expands to empty -> dst removed, not errored
eval instant at 50m label_replace(src, "svc", "${missing}", "path", "(?P<kind>[a-z]+)/.*")
  src{path="api/users"} 1
  src{path="web/login"} 2
""")
  }

  test("Java-only regex constructs are rejected like RE2 rejects them " +
      "(lookaround, backreferences, possessive, (?U), \\Z)") {
    run("""
load 5m
  rj{s="aa"} 1+0x10

# lookahead / lookbehind: no RE2 equivalent
eval_fail instant at 50m rj{s=~"a(?=a)"}
eval_fail instant at 50m rj{s=~"a(?!b)"}
eval_fail instant at 50m rj{s=~"(?<=a)a"}
eval_fail instant at 50m rj{s=~"(?<!b)a"}

# backreferences
eval_fail instant at 50m rj{s=~"(a)\\1"}
eval_fail instant at 50m rj{s!~"(a)\\1"}

# possessive / nested quantifiers
eval_fail instant at 50m rj{s=~"a++"}
eval_fail instant at 50m rj{s=~"a*+"}
eval_fail instant at 50m rj{s=~"a{1,2}{2}"}

# ungreedy flag and \Z
eval_fail instant at 50m rj{s=~"(?U)a+"}
eval_fail instant at 50m rj{s=~"aa\\Z"}

# Java-style named groups are not RE2's spelling
eval_fail instant at 50m rj{s=~"(?<g>a)a"}

# and the still-shared subset keeps working beside them
eval instant at 50m rj{s=~"a{2}"}
  rj{s="aa"} 1

eval instant at 50m rj{s=~"a+?"}
  rj{s="aa"} 1
""")
  }

  test("invalid regexes fail at PARSE time in every matcher position " +
      "(parse.go:919-931 NewMatcher)") {
    run("""
load 5m
  pf{s="x"} 1+0x10

eval_fail instant at 50m pf{s=~"(unclosed"}
eval_fail instant at 50m pf{s!~"(unclosed"}
eval_fail instant at 50m pf{s=~"[z-a]"}
eval_fail instant at 50m pf{s=~"a[["}
eval_fail instant at 50m {__name__=~"pf(("}

# a valid pattern in the same shapes still selects
eval instant at 50m {__name__=~"p.", s=~"[w-y]"}
  pf{s="x"} 1
""")
  }

  test("keywords are ordinary label names in matchers and grouping " +
      "lists (lexInsideBraces ignores keywords; labels() checks isLabel)") {
    run("""
load 5m
  kw{and="x", or="y", group_left="g", inf="i", nan="n"} 1+0x10
  kw{and="z", or="y", group_left="g", inf="i", nan="n"} 2+0x10

eval instant at 50m kw{and="x"}
  kw{and="x", or="y", group_left="g", inf="i", nan="n"} 1

eval instant at 50m kw{and=~"x|z", nan="n"}
  kw{and="x", or="y", group_left="g", inf="i", nan="n"} 1
  kw{and="z", or="y", group_left="g", inf="i", nan="n"} 2

eval instant at 50m sum by (and) (kw)
  {and="x"} 1
  {and="z"} 2

eval instant at 50m sum without (and, or, inf, nan) (kw)
  {group_left="g"} 3
""")
  }

  test("a metric literally NAMED a keyword needs the __name__ form: " +
      "the bare selector is a keyword token at expression position") {
    run("""
load 5m
  and{x="y"} 1+0x10

eval_fail instant at 50m and{x="y"}

eval instant at 50m {__name__="and"}
  and{x="y"} 1

eval instant at 50m sum({__name__="and"})
  {} 1
""")
  }

  test("quantile ranks NaN values FIRST like the vintage value heap " +
      "(functions.go:1257-1262): low phi lands on NaN, high phi skips it") {
    run("""
load 5m
  qn{s="a"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  qn{s="b"} 1+0x10
  qn{s="c"} 3+0x10
  qt 1 NaN 3 _ _ _ _ _ _ _ _

# sorted group is [NaN, 1, 3]: rank(0.5) = index 1 -> 1 (NOT 3, which
# a NaN-last sort would give); rank(0.9) interpolates 1..3; rank(0.1)
# falls on the NaN slot
eval instant at 50m quantile(0.5, qn)
  {} 1

eval instant at 50m quantile(0.9, qn)
  {} 2.6

eval instant at 50m quantile(0.1, qn)
  {} NaN

# same heap order inside quantile_over_time windows
eval instant at 15m quantile_over_time(0.5, qt[15m])
  {} 1

eval instant at 15m quantile_over_time(0.1, qt[15m])
  {} NaN
""")
  }

  test("scalar() multi-element NaN, NaN clamp limits, Inf aggregation " +
      "algebra (sum/avg/stddev through Go float64 arithmetic)") {
    run("""
load 5m
  mm{s="a"} 0+10x10
  mm{s="b"} 0+20x10
  iv{s="p"} Inf Inf Inf Inf Inf Inf Inf Inf Inf Inf Inf
  iv{s="n"} -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf
  iv{s="r"} 1+0x10

# scalar() is NaN for anything but exactly one element
eval instant at 50m scalar(mm)
  {} NaN

eval instant at 50m scalar(mm{s="zzz"})
  {} NaN

# a NaN clamp LIMIT NaNs every value (Go math.Min/Max propagate NaN
# from either side — the limit side included)
eval instant at 50m clamp_max(mm, 0/0)
  {s="a"} NaN
  {s="b"} NaN

# Inf algebra through the plain float64 sums the vintage aggregators
# keep: Inf + -Inf = NaN; Inf/2 = Inf; E[x²]−E[x]² with an Inf = NaN
eval instant at 50m sum(iv)
  {} NaN

eval instant at 50m avg(iv{s=~"p|n"})
  {} NaN

eval instant at 50m avg(iv{s=~"p|r"})
  {} Inf

eval instant at 50m stddev(iv{s=~"p|r"})
  {} NaN
""")
  }

  test("histogram_quantile 'le' parsing is the vintage ParseFloat " +
      "dialect: whitespace/hex skip the bucket, 'infinity' is +Inf") {
    run("""
load 5m
  hs{le="0.5"} 0+5x10
  hs{le=" 1 "} 0+7x10
  hs{le="0x1p-1"} 0+6x10
  hs{le="+Inf"} 0+10x10
  hi{le="1"} 0+5x10
  hi{le="iNfInItY"} 0+10x10

# ' 1 ' (Go ParseFloat never trims) and '0x1p-1' (no hex floats in the
# vintage) fail to parse -> those buckets are SKIPPED (quantile.go
# bucket collection), leaving (0.5: 50, +Inf: 100); rank 60 exceeds
# the inner count -> second-highest bound. Java's parseDouble would
# have accepted both (0x1p-1 = 0.5!) and changed the answer.
eval instant at 50m histogram_quantile(0.6, hs)
  {} 0.5

# 'infinity' in any case IS the +Inf bucket (Go special syntax) — the
# histogram is valid and interpolates; without it -> NaN
eval instant at 50m histogram_quantile(0.5, hi)
  {} 1
""")
  }

  test("count_values formats specials like Go strconv: -0 keeps its " +
      "sign, infinities, NaN, huge integers never go scientific") {
    run("""
# -0 loads as PLAIN literals: the a+bxn expansion computes start+i*inc
# and IEEE -0.0 + 0.0 is +0.0, which would silently erase the sign
load 5m
  sv{i="1"} -0 -0 -0 -0 -0 -0 -0 -0 -0 -0 -0
  sv{i="2"} 0+0x10
  sv{i="3"} Inf Inf Inf Inf Inf Inf Inf Inf Inf Inf Inf
  sv{i="4"} -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf -Inf
  sv{i="5"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  sv{i="6"} 0.1+0x10
  sv{i="7"} 100000000000000000000+0x10

# FormatFloat(v, 'f', -1, 64): negative zero is "-0", NOT merged with
# "0"; Inf spells "+Inf"; 'f' means no scientific notation ever —
# 1e20 (beyond int64) prints all its digits
eval instant at 50m count_values("v", sv)
  {v="-0"} 1
  {v="0"} 1
  {v="+Inf"} 1
  {v="-Inf"} 1
  {v="NaN"} 1
  {v="0.1"} 1
  {v="100000000000000000000"} 1
""")
  }

  test("round to_nearest=0 and negative, date-function fractional/" +
      "negative epoch truncation (functions.go:332-350,902)") {
    run("""
load 5m
  rv 2.5+0x10
  tsv 86399.9+0x10
  neg -1.5+0x10

eval instant at 50m round(rv)
  {} 3

eval instant at 50m round(rv, 0.5)
  {} 2.5

# toNearest=0: inverse is +Inf, floor(v*Inf+0.5)/Inf = NaN for EVERY v
eval instant at 50m round(rv, 0)
  {} NaN

# negative toNearest flips the tie direction: floor(-2.5+0.5)/-1 = 2
# (round(2.5) is 3 but round(2.5, -1) is 2)
eval instant at 50m round(rv, -1)
  {} 2

# date functions convert via int64(v): fractional seconds TRUNCATE
# toward zero, so 86399.9 is still 1970-01-01 23:59:59
eval instant at 50m day_of_month(tsv)
  {} 1

eval instant at 50m hour(tsv)
  {} 23

eval instant at 50m minute(tsv)
  {} 59

# negative epochs land in 1969; int64(-1.5) truncates to -1
eval instant at 50m year(neg)
  {} 1969

eval instant at 50m day_of_month(neg)
  {} 31
""")
  }

  test("grouping BY __name__ keeps the metric name as a group label; " +
      "set-op signatures exclude it (engine.go:1051-1063)") {
    run("""
load 5m
  m1{s="a"} 0+10x10
  m1{s="b"} 0+20x10
  m2{s="c"} 0+5x10
  m2{s="a"} 0+7x10

# __name__ is an ordinary grouping label for aggregations: the result
# metric carries it (and nothing else)
eval instant at 50m sum by (__name__) ({__name__=~"m."})
  m1 300
  m2 120

eval instant at 50m count by (__name__, s) (m1)
  m1{s="a"} 1
  m1{s="b"} 1

# set-op signatures are computed WITHOUT the name: m2{s="a"} collides
# with m1{s="a"} and is dropped by or, even though the metrics differ
eval instant at 50m m1 or m2
  m1{s="a"} 100
  m1{s="b"} 200
  m2{s="c"} 50

# and unless removes ACROSS names for the same reason
eval instant at 50m m1 unless m2
  m1{s="b"} 200
""")
  }

  test("label_replace/label_join output-collision and name-validation " +
      "errors (functions.go:779-880)") {
    run("""
load 5m
  cm{s="q1"} 0+1x10
  cm{s="q2"} 0+2x10
  cj{x="1", y="2"} 0+3x10
  cj{x="12"} 0+4x10
  cd{d="a"} 0+5x10
  cd{d="b"} 0+6x10

# two MATCHED elements differing only in the overwritten label
# collapse to one label set -> duplicated-output error in both engines
eval_fail instant at 50m label_replace(cm, "s", "same", "s", "q.")

# invalid destination label name errors (after the regex check)
eval_fail instant at 50m label_replace(cm, "0bad", "x", "s", ".*")

# invalid regex errors FIRST
eval_fail instant at 50m label_replace(cm, "0bad", "x", "s", "(unclosed")

# replacement that keeps elements distinct still works
eval instant at 50m label_replace(cm, "n", "$1", "s", "q(.)")
  cm{n="1", s="q1"} 10
  cm{n="2", s="q2"} 20

# label_join: invalid dst / src names error
eval_fail instant at 50m label_join(cj, "0bad", "-", "x")
eval_fail instant at 50m label_join(cj, "d", "-", "0bad")

# collision via deletion: joining one MISSING source gives the empty
# string, an empty result DELETES dst, and the two elements differed
# only in d -> both collapse to bare cd -> dup error
eval_fail instant at 50m label_join(cd, "d", "-", "nosuch")

# with a separator the two cj elements stay distinct ("1-2" vs "12-";
# the missing y joins as the empty string)
eval instant at 50m label_join(cj, "d", "-", "x", "y")
  cj{d="1-2", x="1", y="2"} 30
  cj{d="12-", x="12"} 40
""")
  }

  test("holt_winters factor bounds are checked before evaluation " +
      "(functions.go:227-232), topk/bottomk k truncates like evalInt") {
    run("""
load 5m
  hw{s="a"} 0+10x10
  hw{s="b"} 0+20x10
  hw{s="c"} 0+30x10

# the OPEN interval 0 < f < 1: both endpoints fail, for both factors
eval_fail instant at 50m holt_winters(hw{s="a"}[30m], 0, 0.5)
eval_fail instant at 50m holt_winters(hw{s="a"}[30m], 1, 0.5)
eval_fail instant at 50m holt_winters(hw{s="a"}[30m], 0.5, 0)
eval_fail instant at 50m holt_winters(hw{s="a"}[30m], 0.5, 1)

# and the check runs BEFORE the matrix is consumed: a selector that
# matches NOTHING still errors (the vintage evalFloat checks precede
# the output loop)
eval_fail instant at 50m holt_winters(hw{s="nope"}[30m], 2, 0.5)

# valid factors on the linear series reproduce the level+trend fit
eval instant at 50m holt_winters(hw{s="a"}[30m], 0.5, 0.5)
  {s="a"} 100

# k goes through evalInt: int64 truncation toward zero — 2.7 keeps 2,
# 1.9 keeps 1; an int64-overflowing k errors
eval instant at 50m topk(2.7, hw)
  hw{s="c"} 300
  hw{s="b"} 200

eval instant at 50m bottomk(1.9, hw)
  hw{s="a"} 100

eval_fail instant at 50m topk(1e20, hw)
""")
  }

  test("histogram_quantile NaN bucket counts pass the envelope " +
      "untouched and poison only probed buckets (quantile.go:59-153)") {
    // ensureMonotonic raises only counts STRICTLY below the running
    // max — NaN fails both comparisons and survives; bucketQuantile's
    // sort.Search then probes a NON-monotonic predicate, so which
    // buckets the binary search touches decides the answer, exactly
    // like the vintage engine.
    run("""
load 5m
  hnan{le="1"} 0+10x10
  hnan{le="2"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  hnan{le="+Inf"} 0+20x10
  hnan4{le="1"} 0+1x10
  hnan4{le="2"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  hnan4{le="3"} 0+3x10
  hnan4{le="+Inf"} 0+4x10

# 3 buckets (100, NaN, Inf:200): every rank probes the NaN middle
# bucket first (h=1), the predicate is false, and the search lands on
# len-1 -> second-highest bound, REGARDLESS of q
eval instant at 50m histogram_quantile(0.5, hnan)
  {} 2

eval instant at 50m histogram_quantile(0.1, hnan)
  {} 2

# 4 buckets (10, NaN, 30, Inf:40): rank 20 lands in bucket 2 (count
# 30) whose interpolation SUBTRACTS the NaN predecessor -> NaN result
eval instant at 50m histogram_quantile(0.5, hnan4)
  {} NaN

# NaN q: not <0, not >1, rank = NaN satisfies no bucket ->
# second-highest bound (the vintage answer, not NaN)
eval instant at 50m histogram_quantile(0/0, hnan)
  {} 2
""")
  }

  test("histogram_quantile monotonic-envelope interpolation, and the " +
      "vintage quirk that the +Inf bucket is never raised " +
      "(quantile.go:143-153 `for i := range buckets[1:]`)") {
    run("""
load 5m
  hv{le="0.5"} 0+5x10
  hv{le="1"} 0+2x10
  hv{le="+Inf"} 0+6x10
  hd{le="1"} 0+10x10
  hd{le="5"} 0+10x10
  hd{le="+Inf"} 0+4x10

# envelope: the dip (50, 20, 60) is raised to (50, 50, 60); rank 30
# falls in the FIRST bucket -> linear from the natural 0 lower bound
eval instant at 50m histogram_quantile(0.5, hv)
  {} 0.3

# rank 54 exceeds the raised middle count 50 -> highest bucket ->
# second-highest upper bound
eval instant at 50m histogram_quantile(0.9, hv)
  {} 1

eval instant at 50m histogram_quantile(1, hv)
  {} 1

# the vendored loop `for i := range buckets[1:]` indexes buckets[i],
# touching 0..len-2 only: an +Inf count (40) BELOW the inner counts
# (100) is never raised, rank = q*40 probes the inner bucket and
# interpolates there — q=1 lands at 0.4, not at an upper bound
eval instant at 50m histogram_quantile(0.5, hd)
  {} 0.2

eval instant at 50m histogram_quantile(1, hd)
  {} 0.4
""")
  }

  test("histogram_quantile non-positive lowest bound: no natural-zero " +
      "interpolation below 0 (quantile.go:94-96)") {
    run("""
load 5m
  hneg{le="-1"} 0+4x10
  hneg{le="0.5"} 0+7x10
  hneg{le="+Inf"} 0+10x10

# rank 20 falls in the lowest bucket whose bound is <= 0 -> the bound
# itself, NOT a 0->-1 interpolation
eval instant at 50m histogram_quantile(0.2, hneg)
  {} -1

# rank 50 interpolates -1 .. 0.5 with count 30, rank-in-bucket 10
eval instant at 50m histogram_quantile(0.5, hneg)
  {} -0.5

# rank 99 exceeds the second bucket's 70 -> highest bucket ->
# second-highest bound
eval instant at 50m histogram_quantile(0.99, hneg)
  {} 0.5
""")
  }

  test("count_values label collision: the value label OVERWRITES an " +
      "existing label of the same name (engine.go:1269-1282 lb.Set)") {
    run("""
load 5m
  cv{v="a", job="j1"} 0+1x10
  cv{v="b", job="j1"} 0+1x10
  cv{v="c", job="j2"} 0+2x10

# series already carry a "v" label; count_values("v", ...) overwrites
# it with the formatted value, MERGING the two v="a"/v="b" series that
# collide after the overwrite
eval instant at 50m count_values("v", cv)
  {v="10"} 2
  {v="20"} 1

eval instant at 50m count_values by (job) ("v", cv)
  {job="j1", v="10"} 2
  {job="j2", v="20"} 1

# without: the value label is NOT appended to the grouping; the
# original v is overwritten after the grouping labels are deleted
eval instant at 50m count_values without (job) ("v", cv)
  {v="10"} 2
  {v="20"} 1
""")
  }

  test("or/unless with overlapping signatures: full-label-set sigs by " +
      "default, on()/ignoring() projections (engine.go VectorOr/Unless)") {
    run("""
load 5m
  l{job="x", extra="1"} 0+1x10
  l{job="y"} 0+2x10
  r{job="x"} 0+10x10
  r{job="z"} 0+30x10

# default sig = full label set (metric name excluded): l's extra="1"
# makes its job="x" sig DIFFERENT from r's, so r{job="x"} survives or
eval instant at 50m l or r
  l{job="x", extra="1"} 10
  l{job="y"} 20
  r{job="x"} 100
  r{job="z"} 300

# on (job): sigs collapse to job -> r{job="x"} is now a duplicate of
# l{job="x"} and drops; r{job="z"} still fills
eval instant at 50m l or on (job) r
  l{job="x", extra="1"} 10
  l{job="y"} 20
  r{job="z"} 300

# unless on (job): l{job="x"} has a right-side sig match -> removed
eval instant at 50m l unless on (job) r
  l{job="y"} 20

# ignoring (extra) reaches the same projection from the other side
eval instant at 50m l unless ignoring (extra) r
  l{job="y"} 20

# no projection: sigs differ (extra="1") -> nothing removed
eval instant at 50m l unless r
  l{job="x", extra="1"} 10
  l{job="y"} 20
""")
  }

  test("per-operand offsets: each binop side evaluates at its own " +
      "shifted time (week-over-week pattern)") {
    run("""
load 5m
  m{job="a"} 0+10x10
  m{job="b"} 100-5x10
  cnt{job="a"} 0+60x10

# the un-offset side reads t=50m (100/75), the offset side t=40m (80/60):
# signatures match on the full label set, values subtract across time
eval instant at 50m m - m offset 10m
  {job="a"} 20
  {job="b"} -10

# offset on the LEFT operand works the same way
eval instant at 50m m offset 10m - m
  {job="a"} -20
  {job="b"} 10

# both sides offset by different amounts
eval instant at 50m m offset 5m - m offset 10m
  {job="a"} 10
  {job="b"} -5

# rate self-comparison across offset windows: the counter is perfectly
# linear, so the two windows agree and the ratio is exactly 1
eval instant at 50m rate(cnt[10m]) / rate(cnt[10m] offset 10m)
  {job="a"} 1

# comparison filtering across offsets: m grew for job=a, shrank for b
eval instant at 50m m > m offset 10m
  m{job="a"} 100

# vintage bool keeps the name on vector-vector comparisons (see the
# vector_matching divergence group above)
eval instant at 50m m > bool m offset 10m
  m{job="a"} 1
  m{job="b"} 0

# aggregation of an offset operand composes with an un-offset one
eval instant at 50m sum(m) - sum(m offset 10m)
  {} 10
""")
  }

  test("aggregations over an EMPTY vector return empty, not zero " +
      "(engine.go:1253-1331 iterates matched series only)") {
    run("""
load 5m
  m{job="a"} 0+10x10

eval instant at 50m sum(nonexistent)

eval instant at 50m count(nonexistent)

eval instant at 50m avg(nonexistent)

eval instant at 50m min(nonexistent)

eval instant at 50m stddev(nonexistent)

eval instant at 50m topk(3, nonexistent)

eval instant at 50m quantile(0.5, nonexistent)

eval instant at 50m count_values("v", nonexistent)

eval instant at 50m sum by (job) (m{job="nope"})

# the standard default idiom: or vector(0) fills the empty aggregate
eval instant at 50m sum(nonexistent) or vector(0)
  {} 0

# but a NON-empty aggregate wins the or
eval instant at 50m sum(m) or vector(0)
  {} 100

# functions over empty vectors are empty too (not errors)
eval instant at 50m abs(nonexistent)

eval instant at 50m sort(nonexistent)

eval instant at 50m histogram_quantile(0.5, nonexistent)

# ... and empty range selections likewise
eval instant at 50m rate(nonexistent[10m])

eval instant at 50m count_over_time(nonexistent[10m])
""")
  }

  test("metric-name keep/drop matrix: sort keeps, value-mapping " +
      "functions drop (functions.go dropMetricName call sites)") {
    run("""
load 5m
  m{job="a"} 0+10x10

# sort/sort_desc return samples untouched: name KEPT (functions.go:288-304)
eval instant at 50m sort(m)
  m{job="a"} 100

eval instant at 50m sort_desc(m)
  m{job="a"} 100

# value-mapping functions drop it
eval instant at 50m ceil(m)
  {job="a"} 100

eval instant at 50m clamp_max(m, 50)
  {job="a"} 50

eval instant at 50m round(m)
  {job="a"} 100

eval instant at 50m timestamp(m)
  {job="a"} 3000

# over-time folds drop it (aggrOverTime, functions.go:377)
eval instant at 50m count_over_time(m[10m])
  {job="a"} 3

# date functions applied to a vector drop it
eval instant at 50m hour(m * 0)
  {job="a"} 0

# vector() emits the bare empty label set
eval instant at 50m vector(7)
  {} 7

# VINTAGE quirk: shouldDropMetricName (engine.go:1460-1467) lists only
# + - * / % — POW keeps the metric name on vector operands
eval instant at 50m m ^ 1
  m{job="a"} 100

# vector ^ vector: the lhs metric (name included) survives
eval instant at 50m m ^ (m * 0 + 2)
  m{job="a"} 10000

# ...while the listed arithmetic ops drop it
eval instant at 50m m * 1
  {job="a"} 100

eval instant at 50m m % 1000
  {job="a"} 100
""")
  }

  test("set-op precedence and associativity: or binds loosest, " +
      "and/unless left-associate (parse.go operator precedence)") {
    run("""
load 5m
  a{x="1"} 0+10x10
  a{x="2"} 0+10x10
  b{x="1"} 0+20x10
  c{x="2"} 0+30x10
  c{x="3"} 0+30x10

# (a and b) or c — NOT a and (b or c)
eval instant at 50m a and b or c
  a{x="1"} 100
  c{x="2"} 300
  c{x="3"} 300

# a or (b and c): and binds tighter; b/c share no sig so the right arm
# is empty and the or passes a through
eval instant at 50m a or b and c
  a{x="1"} 100
  a{x="2"} 100

# (a unless c) or b: unless at and-precedence, then the or's left arm
# already holds sig x=1 so b is deduped away
eval instant at 50m a unless c or b
  a{x="1"} 100

# left association: (a unless b) unless c = {x=2} unless c = empty
eval instant at 50m a unless b unless c

# parens flip it: a unless (b unless c) = a unless b{x=1} = {x=2}
eval instant at 50m a unless (b unless c)
  a{x="2"} 100

# comparisons bind tighter than set ops: (a == bool 100) or c; the
# bool result keeps the vintage name, sigs x=1/x=2 dedup c{x="2"}
eval instant at 50m a == bool 100 or c
  a{x="1"} 1
  a{x="2"} 1
  c{x="3"} 300
""")
  }

  test("grouping by a MISSING label: absent groups carry no label, " +
      "without a missing label is a no-op on the rest") {
    run("""
load 5m
  m{job="a", l="x"} 0+10x10
  m{job="b"} 0+20x10

# series without l group under the bare label set
eval instant at 50m sum by (l) (m)
  {l="x"} 100
  {} 200

# grouping by an entirely absent label folds everything into one group
eval instant at 50m sum by (nope) (m)
  {} 300

# without(missing) keeps the full label set (minus __name__)
eval instant at 50m sum without (nope) (m)
  {job="a", l="x"} 100
  {job="b"} 200

# mixed existing+missing grouping labels: only present ones survive
eval instant at 50m count by (job, nope) (m)
  {job="a"} 1
  {job="b"} 1

# on(missing) vector matching: both sides collapse to the empty sig —
# one-to-one matches iff each side has exactly one series
eval instant at 50m sum(m{job="a"}) + on(nope) sum(m{job="b"})
  {} 300
""")
  }

  test("duration grammar is the vintage single-unit form: compound " +
      "and zero durations fail at parse time (model/time.go:180-213)") {
    run("""
load 5m
  m{job="a"} 0+10x20

# single-unit forms across every unit parse and select
eval instant at 90m count_over_time(m[90m])
  {job="a"} 19

eval instant at 90m count_over_time(m[1h])
  {job="a"} 13

# 5400s = 90m: seconds form reaches the same window
eval instant at 90m count_over_time(m[5400s])
  {job="a"} 19

# compound durations are NOT a valid duration string in this vintage
eval_fail instant at 50m count_over_time(m[1h30m])

eval_fail instant at 50m m offset 1h30m

# zero durations are rejected (parse.go:1131-1140)
eval_fail instant at 50m count_over_time(m[0s])

eval_fail instant at 50m m offset 0m
""")
  }

  test("string escapes: the Go set incl. octal and \\U; bad escapes " +
      "fail at parse time (lex.go:649-699, strutil.Unquote)") {
    // NB: \u sequences are masked (Scala pre-processes \uXXXX even in
    // triple-quoted source), so the DSL text receives them verbatim
    val bsu = "\\u"
    run(s"""
load 5m
  m{x="A"} 0+10x10
  n{u="é"} 0+20x10

# \\101 = octal 65 = 'A'; \\x41 and A reach the same label value
eval instant at 50m m{x="\\101"}
  m{x="A"} 100

eval instant at 50m m{x="\\x41"}
  m{x="A"} 100

eval instant at 50m m{x="A"}
  m{x="A"} 100

# 4-digit and 8-digit unicode escapes; é = U+00E9
eval instant at 50m n{u="${bsu}00e9"}
  n{u="é"} 200

eval instant at 50m n{u="\\U000000e9"}
  n{u="é"} 200

# unknown escape, truncated escape, and surrogate code points all fail
eval_fail instant at 50m m{x="\\q"}

eval_fail instant at 50m m{x="${bsu}00"}

eval_fail instant at 50m m{x="${bsu}d800"}
""")
  }

  test("vintage parse-error grammar: range/offset placement, double " +
      "grouping, double metric name, missing comma (parse.go:574-949)") {
    run("""
load 5m
  m{a="1"} 0+10x10

# range specification must follow a vector selector — not another
# range, not a function result, not a paren expression
eval_fail instant at 50m m[5m][5m]

eval_fail instant at 50m rate(m[5m])[5m]

eval_fail instant at 50m (m)[5m]

# offset must follow an instant or range selector
eval_fail instant at 50m (1 + 2) offset 5m

eval_fail instant at 50m sum(m) offset 5m

# only one grouping clause per aggregation
eval_fail instant at 50m sum by (a) without (a) (m)

# metric name set twice (name position + __name__ matcher)
eval_fail instant at 50m m{__name__="other"}

# missing comma between matchers
eval_fail instant at 50m m{a="1" b="2"}

# control: the well-formed variants all evaluate
eval instant at 50m sum by (a) (m)
  {a="1"} 100

eval instant at 50m count_over_time(m[5m] offset 5m)
  {a="1"} 2

eval instant at 50m {__name__="m"}
  m{a="1"} 100

# a trailing comma is legal inside matcher braces (the multi-line
# listing allowance, parse.go:873-876) and empty braces after a name
# are just the name...
eval instant at 50m m{a="1",}
  m{a="1"} 100

eval instant at 50m m{}
  m{a="1"} 100

# ...but grouping lists take no trailing comma (labels() expects a
# label after every comma)
eval_fail instant at 50m sum by (a,) (m)

# aggregation parameter TYPE errors are parse-time (checkType):
# count_values wants a string, topk/quantile want a scalar
eval_fail instant at 50m count_values(1, m)

eval_fail instant at 50m count_values(m, m)

eval_fail instant at 50m quantile("0.5", m)

eval_fail instant at 50m topk("2", m)

# a plain aggregation takes NO parameter
eval_fail instant at 50m sum(0.5, m)
""")
  }

  test("count_values without(): the value label joins the RESULT labels " +
      "(set after the del, before the grouping hash — engine.go), and " +
      "without(v) cannot shed a value label named v; topk emits in " +
      "descending value order (sort.Reverse of the heap)") {
    run("""
load 5m
  cv{job="a", i="1"} 0+10x10
  cv{job="a", i="2"} 0+10x10
  cv{job="a", i="3"} 0+20x10
  cv{job="b", i="1"} 0+10x10
  tk{i="1"} 0+10x10
  tk{i="2"} 0+30x10
  tk{i="3"} 0+20x10

# without(i): result labels = remaining labels + the value label,
# which participates in the grouping key via the result-metric hash
eval instant at 50m count_values without (i) ("v", cv)
  {job="a", v="100"} 2
  {job="a", v="200"} 1
  {job="b", v="100"} 1

# without(v) deletes v BEFORE the value label is set, so the value
# label always survives — without() cannot shed it
eval instant at 50m count_values without (v, i) ("v", cv)
  {job="a", v="100"} 2
  {job="a", v="200"} 1
  {job="b", v="100"} 1

# without everything: only the value label remains
eval instant at 50m count_values without (job, i) ("v", cv)
  {v="100"} 3
  {v="200"} 1

# topk/bottomk emit sorted by value (desc/asc) — the heap is reversed
# before append, a contract eval_ordered can see (ties carry no order
# contract, so the probe values are distinct)
eval_ordered instant at 50m topk(3, tk)
  tk{i="2"} 300
  tk{i="3"} 200
  tk{i="1"} 100

eval_ordered instant at 50m bottomk(2, tk)
  tk{i="1"} 100
  tk{i="3"} 200
""")
  }

  test("vector quantile out-of-range phi: q<0 -> -Inf, q>1 -> +Inf, " +
      "per group, and quantile_over_time agrees (quantile.go:161-170)") {
    run("""
load 5m
  q{s="a", job="x"} 0+10x10
  q{s="b", job="x"} 0+20x10
  q{s="c", job="y"} 0+30x10

# the quantile() helper short-circuits BEFORE ranking: any non-empty
# group answers -Inf / +Inf regardless of its values
eval instant at 50m quantile(-1, q)
  {} -Inf

eval instant at 50m quantile(1.5, q)
  {} Inf

eval instant at 50m quantile by (job) (-0.5, q)
  {job="x"} -Inf
  {job="y"} -Inf

# quantile_over_time goes through the SAME helper, per series
eval instant at 50m quantile_over_time(-1, q{s="a"}[30m])
  {s="a", job="x"} -Inf

eval instant at 50m quantile_over_time(2, q{s="a"}[30m])
  {s="a", job="x"} Inf

# windows are CLOSED [t-W, t]: [5m] at 50m holds (45m, 90) and
# (50m, 100) -> rank 0.73 interpolates between them
eval instant at 50m quantile_over_time(0.73, q{s="a"}[5m])
  {s="a", job="x"} 97.3

# a [1m] window holds the 50m sample alone: any in-range phi answers it
eval instant at 50m quantile_over_time(0.73, q{s="a"}[1m])
  {s="a", job="x"} 100
""")
  }

  test("NaN asymmetry: aggregation min/max SKIP NaN (engine.go " +
      "itemMin/itemMax replace a NaN group value), but *_over_time " +
      "folds use math.Min/Max which POISON (functions.go)") {
    run("""
load 5m
  nm{s="real"} 5+0x10
  nm{s="nan"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  mx{s="m"} 1 2 NaN 4 5 6 7 8 9 10 11

# a NaN group value is replaced by any real sample (either arrival
# order): min/max see through NaN series
eval instant at 50m min(nm)
  {} 5

eval instant at 50m max(nm)
  {} 5

# ...unless the whole group is NaN
eval instant at 50m min(nm{s="nan"})
  {} NaN

eval instant at 50m max(nm{s="nan"})
  {} NaN

# the over_time folds have NO such branch: one NaN in the window
# poisons math.Min/math.Max
eval instant at 50m min_over_time(mx[50m])
  {s="m"} NaN

eval instant at 50m max_over_time(mx[50m])
  {s="m"} NaN

# a window PAST the NaN sample (closed [20m, 50m] starts at the
# fifth sample) is clean again
eval instant at 50m min_over_time(mx[30m])
  {s="m"} 5

# sum/avg never had the branch anywhere: NaN poisons both tiers
eval instant at 50m sum(nm)
  {} NaN

eval instant at 50m sum_over_time(mx[50m])
  {s="m"} NaN
""")
  }

  test("deriv/predict_linear DROP series with fewer than two points " +
      "(functions.go funcDeriv: len < 2 -> continue), not a NaN row") {
    run("""
load 10m
  dv{s="one"} _ _ _ _ _ 5
  dv{s="two"} 0 1 2 3 4 5

# window [15m] at 50m: s="one" holds a single point -> dropped;
# s="two" holds (40m, 4), (50m, 5) -> slope 1/600 per second
eval instant at 50m deriv(dv[15m])
  {s="two"} 0.0016666666666666668

eval instant at 50m predict_linear(dv[15m], 600)
  {s="two"} 6

# both series survive once the window holds two points for each
eval instant at 50m count(deriv(dv[60m]))
  {} 1

eval instant at 50m count(deriv(dv[2h]))
  {} 1
""")
  }

  test("Go math.Mod edges: x % 0 is NaN, Inf % y is NaN, finite x % " +
      "Inf is x (sign of the dividend, IEEE fmod)") {
    run("""
load 5m
  g{job="a"} 0+10x10

eval instant at 50m 5 % 0
  {} NaN

eval instant at 50m (1/0) % 3
  {} NaN

eval instant at 50m (0-1/0) % 3
  {} NaN

eval instant at 50m 5 % (1/0)
  {} 5

eval instant at 50m (0 - 5) % (1/0)
  {} -5

eval instant at 50m 0 % 7
  {} 0

eval instant at 50m g % 0
  {job="a"} NaN

eval instant at 50m g % (1/0)
  {job="a"} 100
""")
  }

  test("topk/bottomk by(): k past the group size returns whole groups; " +
      "comparisons against a NaN scalar filter everything (bool: != 1)") {
    run("""
load 5m
  g{job="a", i="1"} 0+10x10
  g{job="a", i="2"} 0+20x10
  g{job="b", i="1"} 0+30x10

# k exceeds every group: the full input comes back, per group,
# original labels intact
eval instant at 50m topk by (job) (5, g)
  g{job="a", i="1"} 100
  g{job="a", i="2"} 200
  g{job="b", i="1"} 300

eval instant at 50m bottomk by (job) (5, g)
  g{job="a", i="1"} 100
  g{job="a", i="2"} 200
  g{job="b", i="1"} 300

# NaN never compares: filtering comparisons drop every row...
eval instant at 50m g == (0/0)

eval instant at 50m g < (0/0)

eval instant at 50m g >= (0/0)

# ...and bool-mode != answers 1 everywhere (NaN != x is true). This
# vintage KEEPS the metric name on comparisons, bool included
# (shouldDropMetricName lists only + - / * %)
eval instant at 50m g != bool (0/0)
  g{job="a", i="1"} 1
  g{job="a", i="2"} 1
  g{job="b", i="1"} 1

eval instant at 50m g == bool (0/0)
  g{job="a", i="1"} 0
  g{job="a", i="2"} 0
  g{job="b", i="1"} 0
""")
  }

  test("staleness markers inside a range window: every *_over_time fold, " +
      "changes/resets/deriv, idelta/irate see only REAL points; offset " +
      "and lookback interact with markers at the shifted time") {
    // Range selections drop markers (value.go IsStaleNaN filtering in
    // the matrix path), so the fold family must behave as if the
    // marker samples never existed — while INSTANT selection semantics
    // (marker newest in lookback hides the series) apply at the
    // OFFSET-shifted evaluation time.
    run("""
load 5m
  m 0 1 stale 3 stale stale 6

# real points in [0, 30m]: (0m,0) (5m,1) (15m,3) (30m,6)
eval instant at 30m count_over_time(m[30m])
  {} 4

eval instant at 30m sum_over_time(m[30m])
  {} 10

eval instant at 30m avg_over_time(m[30m])
  {} 2.5

eval instant at 30m min_over_time(m[30m])
  {} 0

eval instant at 30m max_over_time(m[30m])
  {} 6

# mean 2.5, var (6.25+2.25+0.25+12.25)/4 = 5.25
eval instant at 30m stddev_over_time(m[30m])
  {} 2.2912878474779195

eval instant at 30m stdvar_over_time(m[30m])
  {} 5.25

# sorted reals [0,1,3,6], phi=0.5: rank 1.5 -> 1 + 0.5*(3-1)
eval instant at 30m quantile_over_time(0.5, m[30m])
  {} 2

# transitions among the REAL points 0->1->3->6: three changes, no
# resets (the dropped markers create no phantom transition)
eval instant at 30m changes(m[30m])
  {} 3

eval instant at 30m resets(m[30m])
  {} 0

# last two REAL points (15m,3) (30m,6)
eval instant at 30m idelta(m[30m])
  {} 3

eval instant at 30m irate(m[30m])
  {} 0.0033333333333333335

# least-squares over the four real points = 1/300 per second
eval instant at 30m deriv(m[30m])
  {} 0.0033333333333333335

# a window holding ONE real point (reals in [10m, 25m]: only (15m,3)):
# count works, the two-point family returns empty
eval instant at 25m count_over_time(m[15m])
  {} 1

eval instant at 25m idelta(m[15m])

eval instant at 25m deriv(m[15m])

# offset x staleness: at 40m, `offset 15m` evaluates at 25m whose
# lookback [20m, 25m] ends on a marker -> hidden
eval instant at 40m m offset 15m

# at 45m the shifted time is 30m: marker at 25m, real 6 at 30m ->
# newest is real, series visible
eval instant at 45m m offset 15m
  m 6
""")
  }

  test("absent() label synthesis: ONLY = matchers of a direct selector " +
      "argument (functions.go:511-531) — regex/negative matchers and " +
      "non-selector expressions synthesize nothing") {
    run("""
load 5m
  present{job="api", instance="0"} 0+10x10

eval instant at 50m absent(present)

eval instant at 50m absent(nonexistent)
  {} 1

# =~ contributes no labels even though it names a value
eval instant at 50m absent(nonexistent{job=~"api"})
  {} 1

# mixed matchers: the = pair synthesizes, != and =~ do not
eval instant at 50m absent(nonexistent{job="api", instance!="0", env=~"prod"})
  {job="api"} 1

eval instant at 50m absent(nonexistent{job="api", env="dev"})
  {job="api", env="dev"} 1

# a parenthesized selector does NOT synthesize: funcAbsent type-asserts
# args[0].(*VectorSelector) and the parser KEEPS ParenExpr nodes
# (parse.go:566; only eval unwraps them, engine.go:739), so the wrapper
# defeats the matcher mining (r16 vintage-exactness fix)
eval instant at 50m absent((nonexistent{job="wrap"}))
  {} 1

# non-selector arguments: no matchers to mine — bare {} 1
eval instant at 50m absent(sum(nonexistent))
  {} 1

eval instant at 50m absent(nonexistent{job="a"} + nonexistent{job="b"})
  {} 1

# a PRESENT metric filtered to empty by matchers: the = matchers
# synthesize (absent answers "what would have to exist")
eval instant at 50m absent(present{job="nosuch"})
  {job="nosuch"} 1

# ...filtered to empty by a comparison: not a selector arg -> {} 1
eval instant at 50m absent(present > 1e6)
  {} 1
""")
  }

  test("or-chain label-set dedup: left operands win per signature, each " +
      "later operand contributes only NOVEL label sets") {
    run("""
load 5m
  a{g="x"} 1+1x10
  b{g="x"} 100+100x10
  b{g="y"} 200+200x10
  c{g="z"} 7 7 7 7 7 7 7 7 7 7 7
  c{g="x"} 9 9 9 9 9 9 9 9 9 9 9

# *1 drops the metric name, so {g="x"} collides across operands:
# a's value survives, b adds {g="y"}, c adds only {g="z"}
eval instant at 50m a*1 or b*1 or c*1
  {g="x"} 11
  {g="y"} 2200
  {g="z"} 7

# explicit right grouping: (b or c) first keeps b's {g="x"}, then the
# outer or still prefers a's — same result, pinning associativity
# cannot change which side wins
eval instant at 50m a*1 or (b*1 or c*1)
  {g="x"} 11
  {g="y"} 2200
  {g="z"} 7

# reversed chain: now c's {g="x"} wins and a contributes nothing
eval instant at 50m c*1 or b*1 or a*1
  {g="x"} 9
  {g="y"} 2200
  {g="z"} 7

# vector() appends the EMPTY label set if novel
eval instant at 50m c*1 or vector(0)
  {g="z"} 7
  {g="x"} 9
  {} 0
""")
  }

  test("histogram_quantile with DUPLICATE le bounds after ParseFloat " +
      "('1' and '1.0' are distinct series, equal bounds): the envelope " +
      "and zero-width interpolation stay deterministic") {
    run("""
load 5m
  dup{le="1"} 0+5x10
  dup{le="1.0"} 0+5x10
  dup{le="2"} 0+10x10
  dup{le="+Inf"} 0+10x10

# buckets at 50m: two at bound 1.0 with EQUAL counts 50, then 100, 100.
# phi=0.5: rank 50 lands on the FIRST le=1.0 bucket -> interpolates
# [0,1] fully: 0 + 1*(50/50)
eval instant at 50m histogram_quantile(0.5, dup)
  {} 1

eval instant at 50m histogram_quantile(0.25, dup)
  {} 0.5

# phi=0.9: rank 90 lands in the le=2 bucket; bucketStart is the
# SECOND le=1.0 bucket's bound, count 100-50, rank 90-50
eval instant at 50m histogram_quantile(0.9, dup)
  {} 1.8

load 5m
  uneq{le="1"} 0+5x10
  uneq{le="1.0"} 0+8x10
  uneq{le="2"} 0+10x10
  uneq{le="+Inf"} 0+10x10

# UNEQUAL counts at the duplicate bound (50 vs 80, either order after
# the non-stable sort): rank 90 > both, so the envelope makes the
# le=2 interpolation identical either way: start 1, count 100-80=20,
# rank 90-80=10 -> 1 + 1*(10/20)
eval instant at 50m histogram_quantile(0.9, uneq)
  {} 1.5
""")
  }

  test("changes/resets across NaN points: NaN->NaN is not a change, " +
      "NaN->real and real->NaN are; NaN never counts as a reset " +
      "(functions.go:723-776)") {
    run("""
load 5m
  n 1 NaN NaN 1 2 NaN 0

# transitions: 1->NaN (change) NaN->NaN (not) NaN->1 (change)
# 1->2 (change) 2->NaN (change) NaN->0 (change) = 5
eval instant at 30m changes(n[30m])
  {} 5

# resets need v[i] < v[i-1]: every comparison against NaN is false,
# so only 2->...->0 could reset — but the NaN sits between, and
# NaN<2 / 0<NaN are both false = 0 resets
eval instant at 30m resets(n[30m])
  {} 0

load 5m
  r 5 4 NaN 3 6 2 2

# real resets: 5->4, (4->NaN->3 hidden by NaN), 6->2
eval instant at 30m resets(r[30m])
  {} 2

# 5->4, 4->NaN, NaN->3, 3->6, 6->2 (2->2 is not a change)
eval instant at 30m changes(r[30m])
  {} 5
""")
  }

  test("degenerate aggregation params: topk/bottomk k=0 and negative k " +
      "return empty; single-sample quantile/stddev/stdvar; vector() " +
      "arithmetic matches on the empty label set") {
    run("""
load 5m
  one{j="a"} 0+10x10
  one{j="b"} 0+20x10
  solo 7 7 7 7 7 7 7 7 7 7 7

# the bounded heap never admits anything at k <= 0 (engine.go push
# guard len(heap) < k)
eval instant at 50m topk(0, one)

eval instant at 50m bottomk(0, one)

eval instant at 50m topk(0 - 1, one)

# a one-element group: rank phi*(n-1) = 0 for every phi -> the value
eval instant at 50m quantile(0.01, solo)
  {} 7

eval instant at 50m quantile(0.99, solo)
  {} 7

eval instant at 50m stddev(solo)
  {} 0

eval instant at 50m stdvar(solo)
  {} 0

# vector() emits the EMPTY label set: two of them match one-to-one
eval instant at 50m vector(1) + vector(2)
  {} 3

eval instant at 50m vector(1) == bool vector(1)
  {} 1

# absent with an explicit __name__ matcher in brace form: the
# __name__ = matcher is SKIPPED in synthesis like the bare-name form
eval instant at 50m absent({__name__="nonexistent", j="x"})
  {j="x"} 1
""")
  }

  test("staleness marker on exactly ONE binop side: the hidden series " +
      "drops from one-to-one matching, set ops see only live sides " +
      "(r13 golden group)") {
    // At 10m: l{a}'s newest in-lookback sample is a marker (hidden),
    // r{b}'s likewise — each signature is live on exactly one side.
    run("""
load 5m
  l{job="a"} 1 2 stale
  l{job="b"} 5 5 5
  r{job="a"} 10 20 30
  r{job="b"} 2 2 stale

# both sides live at 5m: normal one-to-one arithmetic
eval instant at 5m l + r
  {job="a"} 22
  {job="b"} 7

# at 10m no signature is live on BOTH sides -> empty
eval instant at 10m l + r

# or: left operands that are live, plus right signatures absent from
# the live left — r{a} keeps its own metric identity
eval instant at 10m l or r
  l{job="b"} 5
  r{job="a"} 30

# unless: live left minus signatures live on the right
eval instant at 10m l unless r
  l{job="b"} 5

eval instant at 10m l and r

# comparison filtering never resurrects a hidden side either
eval instant at 10m l > 0
  l{job="b"} 5
""")
  }

  test("group_left result-metric collision: two many-side series whose " +
      "copied labels coincide after __name__ drop is the " +
      "grouping-labels error; distinct extra labels pass (r13 golden)") {
    run("""
load 5m
  ma{job="x"} 1 1 1
  mb{job="x"} 2 2 2
  madist{job="x", i="1"} 1 1 1
  mbdist{job="x", i="2"} 2 2 2
  one{job="x"} 10 10 10

# arithmetic drops __name__, so both many-side rows become {job="x"}
# -> engine.go:1023-1039 insertSig duplicate -> error
eval_fail instant at 5m {__name__=~"ma|mb"} * on(job) group_left one

# an extra label on the many side keeps result metrics unique
eval instant at 5m {__name__=~"madist|mbdist"} * on(job) group_left one
  {job="x", i="1"} 10
  {job="x", i="2"} 20
""")
  }

  test("absent() interacts with offset at the SHIFTED evaluation time, " +
      "markers included (r13 golden group)") {
    run("""
load 5m
  m{job="a"} 1 1 1
  mk{job="b"} 1 stale

# m's newest point is 10m; at 20m the 5m lookback is empty -> absent
eval instant at 20m absent(m{job="a"})
  {job="a"} 1

# offset 15m shifts evaluation to 5m where m is live -> empty
eval instant at 20m absent(m{job="a"} offset 15m)

# offset reaching BEFORE the data -> absent fires, labels synthesized
eval instant at 30m absent(m{job="a"} offset 1h)
  {job="a"} 1

# at the shifted time the marker is mk's newest sample: the series is
# hidden, so absent sees nothing and fires
eval instant at 35m absent(mk{job="b"} offset 30m)
  {job="b"} 1

# one step earlier the shifted time lands on the live point
eval instant at 30m absent(mk{job="b"} offset 30m)
""")
  }

  test("aggregations over +/-Inf mixes: sum/avg keep IEEE semantics " +
      "(Inf+Inf=Inf, Inf-Inf=NaN), stddev of infinities is NaN, " +
      "min/max pick the infinities (r13 golden group)") {
    run("""
load 5m
  im{s="p1", g="same"} Inf
  im{s="p2", g="same"} Inf
  im{s="p3", g="mix"} Inf
  im{s="n1", g="mix"} -Inf

eval instant at 0m sum by (g) (im)
  {g="same"} Inf
  {g="mix"} NaN

eval instant at 0m avg by (g) (im)
  {g="same"} Inf
  {g="mix"} NaN

# E[x^2] - mean^2 = Inf - Inf = NaN in both groups
eval instant at 0m stddev by (g) (im)
  {g="same"} NaN
  {g="mix"} NaN

eval instant at 0m stdvar by (g) (im)
  {g="same"} NaN
  {g="mix"} NaN

eval instant at 0m max by (g) (im)
  {g="same"} Inf
  {g="mix"} Inf

eval instant at 0m min by (g) (im)
  {g="same"} Inf
  {g="mix"} -Inf

eval instant at 0m count by (g) (im)
  {g="same"} 2
  {g="mix"} 2
""")
  }

  test("NaN-valued VECTOR pairs under comparison binops: filter mode " +
      "passes the LHS sample through only on !=, bool answers 0/1, " +
      "names kept either way (r14 golden group)") {
    run("""
load 5m
  na{pair="p"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  nb{pair="p"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  real{pair="p"} 5+0x10

# every ordered comparison against NaN is false -> empty
eval instant at 50m na == nb
eval instant at 50m na < nb
eval instant at 50m na >= nb
eval instant at 50m na > real
eval instant at 50m real <= na

# != is the one true comparison (IEEE NaN != anything): the LHS
# sample survives VERBATIM — NaN value, metric name kept (comparison
# ops are not in shouldDropMetricName, engine.go:1460-1467)
eval instant at 50m na != nb
  na{pair="p"} NaN

eval instant at 50m na != real
  na{pair="p"} NaN

eval instant at 50m real != na
  real{pair="p"} 5

# bool mode: 0/1 verdicts, and this vintage KEEPS the name on
# vector-vector bool comparisons too
eval instant at 50m na == bool nb
  na{pair="p"} 0

eval instant at 50m na != bool nb
  na{pair="p"} 1

eval instant at 50m na <= bool nb
  na{pair="p"} 0
""")
  }

  test("NaN values and set-op membership / arithmetic: existence is " +
      "label-based, values never consulted; NaN arithmetic emits NaN " +
      "rows rather than dropping them (r14 golden group)") {
    run("""
load 5m
  na{pair="p"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  nb{pair="p"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN
  real{pair="p"} 5+0x10

# arithmetic between two NaN vectors: the row EXISTS with value NaN
# (contrast with the comparison filters above), name dropped by +
eval instant at 50m na + nb
  {pair="p"} NaN

# set ops consult only signatures: a NaN LHS sample is kept verbatim
eval instant at 50m na and real
  na{pair="p"} NaN

# ...and a NaN RHS still suppresses/admits by existence alone
eval instant at 50m real unless na

eval instant at 50m real or na
  real{pair="p"} 5

eval instant at 50m na or nothing
  na{pair="p"} NaN
""")
  }

  test("label_replace on an ABSENT source label: the empty string is " +
      "the source value, so empty-matching regexes fire and " +
      "non-empty-matching ones leave the metric untouched (r14 golden)") {
    run("""
load 5m
  lra{s="a"} 0+10x10

# (.*) matches "" -> dst gets the literal prefix + empty $1
eval instant at 50m label_replace(lra, "dst", "pre-$1", "missing", "(.*)")
  lra{s="a", dst="pre-"} 100

# expansion "" on a successful match REMOVES/omits the dst label
eval instant at 50m label_replace(lra, "dst", "$1", "missing", "(.*)")
  lra{s="a"} 100

# the empty regex anchors to ^$ — it MATCHES the absent label
eval instant at 50m label_replace(lra, "dst", "x", "missing", "")
  lra{s="a", dst="x"} 100

# a regex that cannot match "" leaves the sample unchanged
eval instant at 50m label_replace(lra, "dst", "x", "missing", "a")
  lra{s="a"} 100
""")
  }

  test("repeated matchers on ONE label are conjunctive: every matcher " +
      "must hold, including the absent-as-empty semantics per matcher " +
      "(r14 golden group)") {
    run("""
load 5m
  rm{s="a"} 0+10x10
  rm{s="b"} 0+20x10
  rm 0+30x10

eval instant at 50m rm{s=~"a|b", s!="b"}
  rm{s="a"} 100

# s!="" excludes the bare series, s!="a" then excludes a
eval instant at 50m rm{s!="", s!="a"}
  rm{s="b"} 200

# .* admits the absent label, !~".+" then keeps ONLY the absent one
eval instant at 50m rm{s=~".*", s!~".+"}
  rm 300

# conflicting equalities can match nothing
eval instant at 50m rm{s="a", s="b"}
""")
  }

  test("NaN quantile phi: quantile/quantile_over_time ERROR (the NaN " +
      "rank panics into the evaluator's recover, quantile.go:176-182 + " +
      "engine.go:599-614) while histogram_quantile lands on the " +
      "second-highest bound (sort.Search finds nothing) (r14 golden)") {
    run("""
load 5m
  qv{s="a"} 0+10x10
  qv{s="b"} 0+20x10
  hq{le="1"} 0+10x10
  hq{le="2"} 0+20x10
  hq{le="+Inf"} 0+30x10

# vector quantile and the over_time form both go through quantile():
# phi = NaN passes both range checks, the NaN rank indexes out of
# bounds, and the recover() surfaces an error — NOT a NaN sample
eval_fail instant at 50m quantile(0/0, qv)
eval_fail instant at 50m quantile by (s) (0/0, qv)
eval_fail instant at 50m quantile_over_time(0/0, qv{s="a"}[30m])

# bucketQuantile has NO such panic: rank = NaN satisfies no
# sort.Search probe, the search returns len-1, and the answer is the
# SECOND-HIGHEST bucket bound regardless of the counts
eval instant at 50m histogram_quantile(0/0, hq)
  {} 2
""")
  }

  test("count_values formats extremes in Go 'f' style — full digits " +
      "for 1e21, plain decimals for 1e-7, never an exponent " +
      "(strconv.FormatFloat(v, 'f', -1, 64), engine.go:1284) (r14 golden)") {
    run("""
load 5m
  cm 0+10x10

# 100 * 1e19 = 1e21: 'f' never switches to scientific notation
eval instant at 50m count_values("v", cm * 1e19)
  {v="1000000000000000000000"} 1

# 100 / 1e9 = 1e-7: plain decimal, shortest round-trip
eval instant at 50m count_values("v", cm / 1e9)
  {v="0.0000001"} 1
""")
  }

  test("scalar() of an empty vector is NaN and flows through " +
      "arithmetic and vector() like any NaN scalar (r14 golden group)") {
    run("""
load 5m
  one{s="a"} 3+0x10

eval instant at 50m scalar(nonexistent)
  {} NaN

eval instant at 50m scalar(nonexistent) + 1
  {} NaN

# vector() of that NaN produces a PRESENT empty-labelled sample
eval instant at 50m vector(scalar(nonexistent))
  {} NaN

# ...which, being present, wins the or against a real fallback of the
# same (empty) signature — left operands win per signature
eval instant at 50m vector(scalar(nonexistent)) or vector(1)
  {} NaN

eval instant at 50m scalar(one) * 2
  {} 6
""")
  }

  test("unary minus folds into NUMBER LITERALS before ^ binds " +
      "(parse.go:544-556 unaryExpr simplification): -2^2 is 4 in this " +
      "vintage, not the modern -(2^2); vector unary keeps __name__ " +
      "(r15 golden group)") {
    run("""
load 5m
  foo{job="a"} 1+1x10

# the sign is folded into the literal BEFORE the binary loop sees ^,
# so the base is (-2) — modern PromQL would parse -(2^2) = -4
eval instant at 50m -2^2
  {} 4

eval instant at 50m -2^-3
  {} -0.125

# ^ stays right-associative around the folded base: (-2)^(3^2)
eval instant at 50m -2^3^2
  {} -512

eval instant at 50m 2^-1^2
  {} 2

# inside a lower-precedence chain the folded literal still binds the
# exponent first: 1 - ((-2)^2)
eval instant at 50m 1 - -2^2
  {} -3

# a unary over a VECTOR is a UnaryExpr (no folding), evaluated before
# any binop — and it does NOT drop the metric name (engine.go:745-758
# only negates values); ^ is not in shouldDropMetricName either
eval instant at 50m -foo^2
  foo{job="a"} 121

eval instant at 50m - -foo
  foo{job="a"} 11

eval instant at 50m +foo
  foo{job="a"} 11

# * DOES drop the name (engine.go:1460) even when the vector side
# arrived through a unary
eval instant at 50m -foo * 2
  {job="a"} -22
""")
  }

  test("group_right include labels come from the ONE side: they " +
      "OVERWRITE the many side's own value and are DELETED when the " +
      "one side lacks them (engine.go:972-974 swap + resultMetric " +
      "Include loop, r15 golden group)") {
    run("""
load 5m
  one{job="api", xtra="from_one"} 10+0x10
  one{job="app"} 20+0x10
  many{job="api", inst="0", xtra="m0"} 1+0x10
  many{job="api", inst="1"} 2+0x10
  many{job="app", inst="0", xtra="m2"} 3+0x10

# result labels = MANY side (post-swap lhs), name dropped by +;
# xtra is copied from the ONE side — overwriting m0, adding to inst=1,
# and DELETING m2 (the app one-side row has no xtra)
eval instant at 50m one + on(job) group_right(xtra) many
  {job="api", inst="0", xtra="from_one"} 11
  {job="api", inst="1", xtra="from_one"} 12
  {job="app", inst="0"} 23

# group_left mirror with the operand order swapped: identical rows
eval instant at 50m many + on(job) group_left(xtra) one
  {job="api", inst="0", xtra="from_one"} 11
  {job="api", inst="1", xtra="from_one"} 12
  {job="app", inst="0"} 23

# a non-commutative op pins WHICH side is the value's left operand:
# group_right makes the one side the left value (one / many) — and
# with an EMPTY include list the many side keeps ALL its own labels,
# xtra included (resultMetric only touches Include-listed names)
eval instant at 50m one / on(job) group_right() many
  {job="api", inst="0", xtra="m0"} 10
  {job="api", inst="1"} 5
  {job="app", inst="0", xtra="m2"} 6.6666666667

# the copied label may itself be a MATCHING label under ignoring():
# here ignoring(inst, xtra) matches on job alone and copies xtra in
eval instant at 50m one + ignoring(inst, xtra) group_right(xtra) many
  {job="api", inst="0", xtra="from_one"} 11
  {job="api", inst="1", xtra="from_one"} 12
  {job="app", inst="0"} 23
""")
  }

  test("changes/resets at the CLOSED window edge: a reset whose earlier " +
      "point sits exactly at t-W is counted, one step later it is not " +
      "(r15 golden group)") {
    run("""
load 1m
  ctr 0 1 2 0 3 4 0 5

# window [2m, 6m]: points 2 0 3 4 0 — both resets in range
eval instant at 6m resets(ctr[4m])
  {} 2

# window [3m, 6m]: points 0 3 4 0 — the 2->0 reset's EARLIER point
# (t=2m) fell off the closed edge; only 4->0 remains
eval instant at 6m resets(ctr[3m])
  {} 1

# window [4m, 7m]: points 3 4 0 5 — one reset
eval instant at 7m resets(ctr[3m])
  {} 1

eval instant at 6m changes(ctr[4m])
  {} 4

eval instant at 6m changes(ctr[3m])
  {} 3

# a window ending BETWEEN samples still anchors [t-W, t] on the raw
# timestamps inside it: [150s, 390s] holds 0 3 4 0
eval instant at 390s resets(ctr[4m])
  {} 1

# single-point window: no pair to compare
eval instant at 4m resets(ctr[1s])
  {} 0

eval instant at 4m changes(ctr[1s])
  {} 0
""")
  }

  test("histogram_quantile le FORMATTING: scientific notation parses to " +
      "the same bound, 'Inf' spells +Inf, malformed le buckets are " +
      "SKIPPED not errors (functions.go:698-705, r15 golden group)") {
    run("""
load 5m
  sci{le="5e-1"} 0+5x10
  sci{le="1"} 0+10x10
  sci{le="+Inf"} 0+10x10

# 5e-1 parses to 0.5: rank 50 at phi=0.5 fills the first bucket
eval instant at 50m histogram_quantile(0.5, sci)
  {} 0.5

eval instant at 50m histogram_quantile(0.75, sci)
  {} 0.75

load 5m
  nfs{le="2"} 0+10x10
  nfs{le="Inf"} 0+10x10

# ParseFloat accepts the sign-less "Inf" spelling as +Inf, so this IS
# a well-formed histogram (le=2 count 100, +Inf 100)
eval instant at 50m histogram_quantile(0.5, nfs)
  {} 1

load 5m
  mal{le="abc"} 0+100x10
  mal{le="1"} 0+10x10
  mal{le="+Inf"} 0+10x10

# the malformed bucket is silently skipped (continue), leaving a
# 2-bucket histogram — its huge count never distorts the quantile
eval instant at 50m histogram_quantile(0.5, mal)
  {} 0.5

load 5m
  lone{le="+Inf"} 0+10x10

# fewer than 2 parseable buckets -> NaN
eval instant at 50m histogram_quantile(0.5, lone)
  {} NaN

load 5m
  noinf{le="1"} 0+5x10
  noinf{le="1e2"} 0+10x10

# 1e2 parses to 100 but is finite: highest bound not +Inf -> NaN
eval instant at 50m histogram_quantile(0.5, noinf)
  {} NaN
""")
  }

  test("set operations with on() EMPTY matching lists collapse every " +
      "signature to one bucket; bool on a set op and on/group label " +
      "collisions are PARSE errors (r15 golden group)") {
    run("""
load 5m
  foo{job="a"} 1+1x10
  foo{job="b"} 2+2x10
  bar{other="x"} 5+0x10

# on() hashes the EMPTY label set: everything matches everything, so
# `and` keeps all of foo whenever bar is nonempty...
eval instant at 50m foo and on() bar
  foo{job="a"} 11
  foo{job="b"} 22

# ...and `unless` erases it
eval instant at 50m foo unless on() bar

eval instant at 50m foo unless on() nonexistent
  foo{job="a"} 11
  foo{job="b"} 22

# or with on() still unions by the COLLAPSED signature: both sides
# share the one empty-set bucket, so the whole left side wins and bar
# is shadowed
eval instant at 50m foo or on() bar
  foo{job="a"} 11
  foo{job="b"} 22

# ignoring() with ALL labels listed is the same collapse
eval instant at 50m foo unless ignoring(job, other) bar

# bool is only a comparison modifier (parse.go:601-613)
eval_fail instant at 50m foo and bool bar

# a label in both on() and group_left() is rejected at parse time
# (parse.go:495-503)
eval_fail instant at 50m foo / on(job) group_left(job) bar
""")
  }

  test("count_values label collisions: the value label OVERWRITES an " +
      "existing metric label and joins the grouping key (engine.go:" +
      "1269-1274 append + lb.Set; 1302-1315 restriction)") {
    run("""
load 5m
  cv{job="api", instance="0"} 0+10x10
  cv{job="api", instance="1"} 0+10x10
  cv{job="app", instance="0"} 50+5x10
  cv2{v="old", job="a"} 0+20x10

# value label = an EXISTING grouping-class label: lb.Set overwrites the
# original job, and since !without the value label is appended to the
# grouping — all three series (value 100 at 50m) collapse to one group
eval instant at 50m count_values("job", cv)
  {job="100"} 3

# by(job) + value label "instance": the original instance values are
# discarded (overwritten), the original job survives as the group key
eval instant at 50m count_values by (job) ("instance", cv)
  {job="api", instance="100"} 2
  {job="app", instance="100"} 1

# without: the value label overwrites cv2's own v="old" AFTER the
# without-del pass (del instance/__name__, then Set v)
eval instant at 50m count_values without (instance) ("v", cv2)
  {job="a", v="200"} 1

# the value label NAMED in the without list: del v, then Set v — the
# label RE-APPEARS carrying the formatted value (engine.go:1291-1308:
# without dels run before the count_values Set)
eval instant at 50m count_values without (v) ("v", cv2)
  {job="a", v="200"} 1

# Go strconv.FormatFloat(v, 'f', -1, 64) formatting: no exponent, no
# trailing zeros
eval instant at 50m count_values("x", cv / 8)
  {x="12.5"} 3
""")
  }

  test("absent() synthesizes only from = matchers of a DIRECT selector " +
      "argument: regex/negative matchers and ParenExpr wrappers " +
      "contribute nothing (functions.go:511-531, parse.go:566)") {
    run("""
load 5m
  ab{job="api", k="x"} 0+10x10

# regex-only matchers: nothing to mine, bare {} 1
eval instant at 50m absent(nonexistent{job=~"a.*"})
  {} 1

# negative matchers never contribute, even != with a single value
eval instant at 50m absent(nonexistent{job!="api", k!~"x.*"})
  {} 1

# regex alongside =: only the = pairs synthesize
eval instant at 50m absent(nonexistent{job="api", k=~"x|y", env="dev"})
  {job="api", env="dev"} 1

# the __name__ matcher itself never synthesizes — a name-only selector
# of a missing metric answers bare {} 1 (naming it BOTH ways is a
# parse error: "metric name must not be set twice")
eval instant at 50m absent({__name__="nonexistent"})
  {} 1
eval_fail instant at 50m absent(nonexistent{__name__="nonexistent"})

# a parenthesized selector is a ParenExpr, not a *VectorSelector —
# the type assertion fails and NO labels synthesize
eval instant at 50m absent((nonexistent{job="api", env="dev"}))
  {} 1

# present metric: empty result regardless of wrapper
eval instant at 50m absent((ab))
""")
  }

  test("scalar ⊙ scalar comparisons REQUIRE bool (parse.go:519,531) " +
      "and return 0/1 scalars (engine.go:1170-1195 btos)") {
    run("""
eval instant at 50m 1 >= bool 1
  {} 1

eval instant at 50m 1 > bool 2
  {} 0

eval instant at 50m 0 == bool -0
  {} 1

eval instant at 50m NaN != bool NaN
  {} 1

eval instant at 50m NaN == bool NaN
  {} 0

eval instant at 50m Inf > bool 1e308
  {} 1

# chained: the comparison folds to a scalar that feeds arithmetic
eval instant at 50m (1 < bool 2) + 41
  {} 42

# without bool: parse error on every comparison operator
eval_fail instant at 50m 1 == 1
eval_fail instant at 50m 1 <= 2
eval_fail instant at 50m (3 % 2) != 0

# bool on non-comparison operators is rejected at parse
eval_fail instant at 50m 1 + bool 2
""")
  }

  test("topk/bottomk k edge cases: evalInt truncates toward zero, " +
      "k < 1 yields an EMPTY vector, NaN/overflow k is an eval error " +
      "(engine.go:637-643, 1258-1263)") {
    run("""
load 5m
  tk{job="a"} 0+10x10
  tk{job="b"} 0+20x10
  tk{job="c"} 0+30x10

# 1.9 truncates to k=1 (Go int64 conversion, not rounding)
eval instant at 50m topk(1.9, tk)
  tk{job="c"} 300

eval instant at 50m bottomk(1.9, tk)
  tk{job="a"} 100

# 0 < k < 1 truncates to 0 -> empty vector, not an error
eval instant at 50m topk(0.9, tk)

eval instant at 50m bottomk(-2, tk)

# k beyond the group size returns everything
eval instant at 50m topk(1e3, tk)
  tk{job="a"} 100
  tk{job="b"} 200
  tk{job="c"} 300

# arithmetic in the parameter folds first (evalInt evaluates any
# scalar expression)
eval instant at 50m topk(1 + 1, tk)
  tk{job="b"} 200
  tk{job="c"} 300

# NaN fails convertibleToInt64 -> "Scalar value NaN overflows int64"
eval_fail instant at 50m topk(NaN, tk)

# so does an over-int64 float
eval_fail instant at 50m topk(1e300, tk)
""")
  }

  test("vector ⊙ NaN-literal comparisons: Go semantics — every " +
      "comparison with a NaN operand is false except !=, so filter " +
      "forms drop everything and bool forms answer 0/1 uniformly " +
      "(engine.go:1199-1235 vectorElemBinop)") {
    run("""
load 5m
  vn{job="a"} 0+10x10
  vn{job="b"} 0+20x10

# filter form: no element compares true against NaN -> empty
eval instant at 50m vn > NaN
eval instant at 50m vn < NaN
eval instant at 50m vn == NaN
eval instant at 50m vn <= NaN

# != with NaN is TRUE for every real value
eval instant at 50m vn != NaN
  vn{job="a"} 100
  vn{job="b"} 200

# bool forms keep __name__ in this vintage (shouldDropMetricName
# lists only + - * / %) and answer 0/1
eval instant at 50m vn >= bool NaN
  vn{job="a"} 0
  vn{job="b"} 0

eval instant at 50m vn != bool NaN
  vn{job="a"} 1
  vn{job="b"} 1

# scalar-on-the-left orientation is the same element-wise rule
eval instant at 50m NaN < bool vn
  vn{job="a"} 0
  vn{job="b"} 0

# arithmetic with NaN is NOT special-cased: it propagates
eval instant at 50m (vn + NaN) == bool 0
  {job="a"} 0
  {job="b"} 0
""")
  }

  test("quantile_over_time at φ edges with staleness markers inside " +
      "the window (quantile.go:156-183; markers are excluded from " +
      "range selections, engine.go matrix path)") {
    run("""
load 1m
  qs{job="a"} 1 2 3 stale 5
  qs{job="b"} 10 10 10 10 10

# CLOSED window [0, 4m] at 4m: the 3m marker is EXCLUDED -> values
# {1, 2, 3, 5} (the 0m sample sits ON the closed left edge, in range)
eval instant at 4m quantile_over_time(0, qs{job="a"}[4m])
  {job="a"} 1

eval instant at 4m quantile_over_time(1, qs{job="a"}[4m])
  {job="a"} 5

# interpolation over the marker-thinned set {1,2,3,5}: rank = 0.5 * 3
# = 1.5 -> midway between 2 and 3
eval instant at 4m quantile_over_time(0.5, qs{job="a"}[4m])
  {job="a"} 2.5

# 0.25 -> rank 0.75 between 1 and 2
eval instant at 4m quantile_over_time(0.25, qs{job="a"}[4m])
  {job="a"} 1.75

# φ out of [0,1]: ∓Inf per series, never an error
eval instant at 4m quantile_over_time(-1, qs[4m])
  {job="a"} -Inf
  {job="b"} -Inf

eval instant at 4m quantile_over_time(2, qs[4m])
  {job="a"} +Inf
  {job="b"} +Inf

# NaN φ floats a NaN rank into values[int(NaN)] and panics in the
# reference -> eval error, exactly like the vector quantile
eval_fail instant at 4m quantile_over_time(NaN, qs[4m])

# a window holding ONLY the marker: the series vanishes entirely
eval instant at 3m quantile_over_time(0.5, qs{job="a"}[30s])
""")
  }
}

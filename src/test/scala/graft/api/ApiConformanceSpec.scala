package graft.api

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkTestBase
import graft.exec.PromQLEngine

/** The reference's `TestEndpoints` matrix (`internal/api/v1/
  * api_test.go:36-439`) ported case-for-case: every error row asserts
  * the exact HTTP status, `errorType`, and — where `api.go` hardcodes
  * the string — the verbatim `error` message; the portable success
  * rows pin the envelope bodies. The fixture is the reference's own
  * (`api_test.go:37-42`): test_metric1{foo=bar} 0+100x100,
  * test_metric1{foo=boo} 1+0x100, test_metric2{foo=boo} 1+0x100 at 1m
  * cadence. */
class ApiConformanceSpec extends SparkTestBase {

  private val m = 60000L

  private lazy val fixture = samplesDF(
    Map("__name__" -> "test_metric1", "foo" -> "bar") -> seriesAt(m, 0, 100, 101),
    Map("__name__" -> "test_metric1", "foo" -> "boo") -> seriesAt(m, 1, 0, 101),
    Map("__name__" -> "test_metric2", "foo" -> "boo") -> seriesAt(m, 1, 0, 101))

  private lazy val api = {
    val a = new HttpApi(spark, new PromQLEngine(spark, fixture))
    a.start()
    a
  }

  private def get(path: String): (Int, String) = {
    val url = new URI(s"http://127.0.0.1:${api.boundPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), UTF_8)
    (code, body)
  }

  /** Assert a 400 bad_data envelope carrying exactly `msg`. */
  private def badData(path: String, msg: String): Unit = {
    val (code, body) = get(path)
    assert(code == 400, s"$path: expected 400, got $code: $body")
    assert(body ==
      s"""{"status":"error","errorType":"bad_data","error":"${msg
        .replace("\\", "\\\\").replace("\"", "\\\"")}"}""",
      s"$path: $body")
  }

  // ---- instant query success rows (api_test.go:66-122) -------------------

  test("scalar literal at a float-seconds instant (api_test.go:66-79)") {
    val (code, body) = get("/api/v1/query?query=2&time=123.4")
    assert(code == 200)
    assert(body == """{"status":"success","data":{"resultType":"scalar",""" +
      """"result":[123.4,"2"]}}""")
  }

  test("scalar literal at RFC3339 instants, Z and numeric offset " +
      "(api_test.go:80-106)") {
    for (t <- Seq("1970-01-01T00:02:03Z", "1970-01-01T01:02:03%2B01:00")) {
      val (code, body) = get(s"/api/v1/query?query=0.333&time=$t")
      assert(code == 200, s"time=$t: $body")
      assert(body == """{"status":"success","data":{"resultType":"scalar",""" +
        """"result":[123,"0.333"]}}""", s"time=$t: $body")
    }
  }

  test("missing time parameter evaluates at now (api_test.go:107-122)") {
    val before = System.currentTimeMillis() / 1000
    val (code, body) = get("/api/v1/query?query=0.333")
    assert(code == 200)
    val ts = """\[(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
    assert(ts.exists(t => t >= before - 1 && t <= before + 120), body)
    assert(body.contains(""""0.333""""), body)
  }

  test("time() over a range is a metric-less matrix (api_test.go:123-144)") {
    val (code, body) = get(
      "/api/v1/query_range?query=time%28%29&start=0&end=2&step=1")
    assert(code == 200, body)
    assert(body == """{"status":"success","data":{"resultType":"matrix",""" +
      """"result":[{"metric":{},"values":[[0,"0"],[1,"1"],[2,"2"]]}]}}""",
      body)
  }

  // ---- range-query error rows (api_test.go:145-225) ----------------------

  test("missing start/end/step fail as unparseable empty strings " +
      "(api_test.go:145-172, Go FormValue semantics)") {
    badData("/api/v1/query_range?query=time%28%29&end=2&step=1",
      "cannot parse \"\" to a valid timestamp")
    badData("/api/v1/query_range?query=time%28%29&start=0&step=1",
      "cannot parse \"\" to a valid timestamp")
    badData("/api/v1/query_range?query=time%28%29&start=0&end=2",
      "cannot parse \"\" to a valid duration")
  }

  test("bad query expressions are bad_data on both endpoints " +
      "(api_test.go:173-190)") {
    val (c1, b1) = get(
      "/api/v1/query?query=invalid%5D%5Bquery&time=1970-01-01T01:02:03%2B01:00")
    assert(c1 == 400 && b1.contains("\"errorType\":\"bad_data\""), b1)
    val (c2, b2) = get(
      "/api/v1/query_range?query=invalid%5D%5Bquery&start=0&end=100&step=1")
    assert(c2 == 400 && b2.contains("\"errorType\":\"bad_data\""), b2)
    // an absent query is an EMPTY query, with the parser's own
    // diagnostic (parse.go:150-153)
    val (c3, b3) = get("/api/v1/query?time=123")
    assert(c3 == 400 && b3.contains("no expression found in input"), b3)
  }

  test("a matrix-typed expression on query_range is bad_data with the " +
      "documentedType wording (engine.go:269-273, api.go:229-232)") {
    badData("/api/v1/query_range?query=test_metric1%5B5m%5D" +
      "&start=0&end=100&step=1",
      "invalid expression type \"range vector\" for range query, " +
        "must be Scalar or instant Vector")
  }

  test("zero step is rejected with the verbatim message (api_test.go:191-201)") {
    badData("/api/v1/query_range?query=time%28%29&start=1&end=2&step=0",
      "zero or negative query resolution step widths are not accepted. " +
        "Try a positive integer")
  }

  test("start after end is rejected with the verbatim message " +
      "(api_test.go:202-211)") {
    badData("/api/v1/query_range?query=time%28%29&start=2&end=1&step=1",
      "end timestamp must not be before start time")
  }

  test("the int64-overflow start row fails bad_data (api_test.go:212-222)") {
    // start 148966367200.372 parses (year ~6690) but sorts AFTER end —
    // in both the reference and here the end<start guard fires first
    badData("/api/v1/query_range?query=time%28%29" +
      "&start=148966367200.372&end=1489667272.372&step=1",
      "end timestamp must not be before start time")
  }

  test("resolution cap message is verbatim (api.go:211-216)") {
    badData("/api/v1/query_range?query=time%28%29&start=0&end=12000&step=1",
      "exceeded maximum resolution of 11,000 points per timeseries. " +
        "Try decreasing the query resolution (?step=XX)")
  }

  test("resolution cap boundary is EXACT: 11,000 points pass, 11,001 " +
      "fail (api.go:211-216 uses a strict >)") {
    // (end-start)/step == 11000 -> admitted (the reference allows
    // exactly 11k); one more step -> the verbatim cap error
    val (ok, _) = get(
      "/api/v1/query_range?query=time%28%29&start=0&end=11000&step=1")
    assert(ok == 200, "exactly 11,000 points must be admitted")
    badData(
      "/api/v1/query_range?query=time%28%29&start=0&end=11001&step=1",
      "exceeded maximum resolution of 11,000 points per timeseries. " +
        "Try decreasing the query resolution (?step=XX)")
  }

  // ---- label values (api_test.go:223-250) --------------------------------

  test("label values for __name__ and foo (api_test.go:223-241)") {
    val (c1, b1) = get("/api/v1/label/__name__/values")
    assert(c1 == 200)
    assert(b1 == """{"status":"success","data":""" +
      """["test_metric1","test_metric2"]}""", b1)
    val (c2, b2) = get("/api/v1/label/foo/values")
    assert(c2 == 200)
    assert(b2 == """{"status":"success","data":["bar","boo"]}""", b2)
  }

  test("a malformed label name is rejected, quoted (api_test.go:242-249)") {
    badData("/api/v1/label/not!!!allowed/values",
      "invalid label name: \"not!!!allowed\"")
  }

  // ---- series (api_test.go:251-365) --------------------------------------

  private def seriesBody(q: String): (Int, String) = get(s"/api/v1/series?$q")

  test("series matchers: plain, regex, multi-set union dedup " +
      "(api_test.go:251-294)") {
    val boo1 =
      """{"__name__":"test_metric1","foo":"boo"}"""
    val (c1, b1) = seriesBody("match[]=test_metric2")
    assert(c1 == 200 && b1 ==
      s"""{"status":"success","data":[{"__name__":"test_metric2","foo":"boo"}]}""",
      b1)
    val (c2, b2) = seriesBody("match[]=test_metric1%7Bfoo%3D~%22.%2Bo%22%7D")
    assert(c2 == 200 && b2 ==
      s"""{"status":"success","data":[$boo1]}""", b2)
    // two overlapping sets and a non-matching one: union, deduped
    val (c3, b3) = seriesBody("match[]=test_metric1%7Bfoo%3D~%22.%2Bo%24%22%7D" +
      "&match[]=test_metric1%7Bfoo%3D~%22.%2Bo%22%7D")
    assert(c3 == 200 && b3 == s"""{"status":"success","data":[$boo1]}""", b3)
    val (c4, b4) = seriesBody("match[]=test_metric1%7Bfoo%3D~%22.%2Bo%22%7D" +
      "&match[]=none")
    assert(c4 == 200 && b4 == s"""{"status":"success","data":[$boo1]}""", b4)
  }

  test("series time-window intersection semantics (api_test.go:295-356)") {
    val hit =
      """{"status":"success","data":[{"__name__":"test_metric2","foo":"boo"}]}"""
    val miss = """{"status":"success","data":[]}"""
    def series(start: String, end: String): String =
      seriesBody(s"match[]=test_metric2&start=$start&end=$end")._2
    assert(series("-2", "-1") == miss) // both before the series
    assert(series("100000", "100001") == miss) // both after
    assert(series("-1", "100000") == hit) // spanning
    assert(series("1", "100") == hit) // inside
    assert(series("1", "100000") == hit) // start inside, end after
    assert(series("-1", "1") == hit) // start before, end inside
  }

  test("missing match[] is the verbatim bad_data row (api_test.go:357-365)") {
    badData("/api/v1/series", "no match[] parameter provided")
  }

  test("TestParseTime matrix case-for-case (api_test.go:516-565)") {
    // fail rows: empty, junk, and a DURATION where a time belongs
    for (bad <- Seq("", "abc", "30s"))
      badData(s"/api/v1/query?query=2&time=${enc(bad)}",
        s"cannot parse \"$bad\" to a valid timestamp")
    // success rows: unix seconds, fractional seconds, RFC3339 Z and
    // numeric offset (the latter two are the same instant)
    def evalAt(t: String): String =
      get(s"/api/v1/query?query=2&time=${enc(t)}")._2
    assert(evalAt("123").contains("[123,"))
    assert(evalAt("123.123").contains("[123.123,"))
    val z = evalAt("2015-06-03T13:21:58.555Z")
    val off = evalAt("2015-06-03T14:21:58.555+01:00")
    assert(z.contains(""""status":"success""""), z)
    assert(z == off, s"Z and +01:00 forms must agree:\n$z\n$off")
  }

  test("TestParseDuration matrix case-for-case (api_test.go:567-620)") {
    // fail rows: empty, junk, an RFC3339 TIME where a duration
    // belongs, and the two int64-nanosecond overflow floats
    for (bad <- Seq("", "abc", "2015-06-03T13:21:58.555Z"))
      badData("/api/v1/query_range?query=time%28%29&start=0&end=2" +
        s"&step=${enc(bad)}",
        s"cannot parse \"$bad\" to a valid duration")
    for (bad <- Seq("-148966367200.372", "148966367200.372")) {
      val (code, body) = get(
        s"/api/v1/query_range?query=time%28%29&start=0&end=2&step=${enc(bad)}")
      assert(code == 400 && body.contains("bad_data"), s"$bad: $body")
    }
    // success rows: bare/fractional seconds and model-duration forms
    def stepOk(s: String, lastT: String): Unit = {
      val (code, body) = get(
        s"/api/v1/query_range?query=time%28%29&start=0&end=250&step=${enc(s)}")
      assert(code == 200 && body.contains(s"[$lastT,"), s"step=$s: $body")
    }
    stepOk("123", "246")
    stepOk("123.333", "246.666")
    stepOk("15s", "240")
    stepOk("5m", "0") // one 5m step past 250s: only t=0 lands
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8)
}

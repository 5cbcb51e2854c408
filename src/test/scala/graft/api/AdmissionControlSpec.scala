package graft.api

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions.{col, udf}

import graft.SparkTestBase
import graft.exec.PromQLEngine

/** Live conformance for the reference's admission control
  * (`promql/engine.go:1474-1503`): a 20-slot query gate where the 21st
  * concurrent query QUEUES (gate.Start blocks until a slot frees or
  * the context expires) and ONE timeout budget covers queue wait and
  * execution, surfacing as errorType `timeout` with the contextDone
  * environment in the message — "query queue" when the query never got
  * a slot (`engine.go:1490`), "query execution" once it did
  * (`engine.go:336`). Driven over live HTTP with evaluations made
  * genuinely slow by a sleeping UDF inside the fixture plan, so slots
  * are held for real while the probes arrive. */
class AdmissionControlSpec extends SparkTestBase {

  // one row, one task: each evaluation sleeps ~3s inside its Spark
  // task, holding its gate slot without eating more than one of the
  // local[32] task slots (21 concurrent queries all sleep in parallel)
  private lazy val api = {
    val base = samplesDF(
      Map("__name__" -> "slow_metric") -> Seq(60000L -> 1.0))
    val sleepy = udf { (v: Double) => Thread.sleep(3000); v }
    val a = new HttpApi(spark,
      new PromQLEngine(spark, base.withColumn("v", sleepy(col("v")))))
    a.start()
    a
  }

  private def get(path: String): (Int, String) = {
    val url = new URI(s"http://127.0.0.1:${api.boundPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    (code, new String(stream.readAllBytes(), UTF_8))
  }

  private val slowQuery = "/api/v1/query?query=slow_metric&time=60"

  /** Wait (bounded) for every gate slot to be claimed — the HTTP
    * round trips race the caller, so poll rather than sleep. */
  private def awaitSaturated(): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (api.gateFreeSlots > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(api.gateFreeSlots == 0,
      s"expected a saturated gate, ${api.gateFreeSlots} slots free")
  }

  test("the 21st concurrent query queues behind the 20-slot gate and " +
      "completes once a slot frees (engine.go:1486-1494)") {
    get("/metrics") // force server init before the clock starts
    val pool = Executors.newFixedThreadPool(21)
    try {
      val started = new CountDownLatch(20)
      val first = (1 to 20).map { _ =>
        pool.submit[(Int, String)] { () =>
          started.countDown()
          get(slowQuery)
        }
      }
      // let the 20 requests land and claim every slot (each holds it
      // for ~3s while the sleeping UDF runs)
      started.await(10, TimeUnit.SECONDS)
      awaitSaturated()
      // the 21st query with the default 2-minute budget QUEUES — the
      // vintage gate never rejects outright — and succeeds once the
      // first wave drains
      val (code, body) = get(slowQuery)
      assert(code == 200, s"queued query failed: $code $body")
      assert(body.contains(""""value":[60,"1"]"""), body)
      first.foreach { f =>
        val (c, b) = f.get(60, TimeUnit.SECONDS)
        assert(c == 200, s"slow query failed: $c $b")
      }
    } finally pool.shutdownNow()
  }

  test("FAIR-pool slots recycle: after any load, every slot id is back " +
      "in the free queue — bounded scheduler-pool registry forever " +
      "(the r14 soak-decay fix)") {
    // sequential requests: each must take and RETURN a slot
    (1 to 5).foreach { _ => get("/api/v1/query?query=slow_metric&time=60") }
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (api.poolSlotsFree < HttpApi.MaxConcurrent &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(api.poolSlotsFree == HttpApi.MaxConcurrent,
      s"leaked pool slots: ${api.poolSlotsFree} free of " +
        s"${HttpApi.MaxConcurrent}")
  }

  test("a query whose budget expires while QUEUED times out with the " +
      "query-queue environment (engine.go:1490, contextDone)") {
    val pool = Executors.newFixedThreadPool(20)
    try {
      val started = new CountDownLatch(20)
      // time=70: a (query, time) key NO prior test evaluated — the r13
      // serving plan cache re-serves an exact-repeat key without
      // re-running its shuffle stages (by design: immutable data per
      // engine), so saturating the gate needs a fresh evaluation. All
      // 20 share the fresh key: they hold 20 slots while the shared
      // sleeping stage runs
      val wave = (1 to 20).map { _ =>
        pool.submit[(Int, String)] { () =>
          started.countDown()
          get("/api/v1/query?query=slow_metric&time=70")
        }
      }
      started.await(10, TimeUnit.SECONDS)
      awaitSaturated()
      // ?timeout=1 shrinks THIS request's budget to 1s — it expires
      // before any of the ~3s evaluations frees a slot
      val (code, body) = get(
        "/api/v1/query?query=slow_metric&time=70&timeout=1")
      assert(code == 503, s"$code $body")
      assert(body == """{"status":"error","errorType":"timeout",""" +
        """"error":"query timed out in query queue"}""", body)
      wave.foreach(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("a query whose budget expires while EXECUTING times out with " +
      "the query-execution environment (engine.go:336)") {
    // a free gate admits immediately; the 1s budget then expires
    // mid-sleep, the job group is cancelled, and the vintage error
    // shape comes back. time=80: a never-cached key (see above) so the
    // evaluation genuinely runs
    val (code, body) = get(
      "/api/v1/query?query=slow_metric&time=80&timeout=1")
    assert(code == 503, s"$code $body")
    assert(body == """{"status":"error","errorType":"timeout",""" +
      """"error":"query timed out in query execution"}""", body)
    // the slot was released on timeout: a follow-up query succeeds
    val (c2, b2) = get(slowQuery)
    assert(c2 == 200, s"$c2 $b2")
  }

  test("a connection flood sheds load at MaxInflight with 503 while " +
      "admitted queries complete and /metrics stays observable") {
    get("/metrics") // force server init before the flood
    // shrink the shed threshold so a 40-request burst drives it (the
    // production 224 would need a thousand-connection flood); the
    // POOL bound itself is structural — a fixed ThreadPoolExecutor
    // can never grow past PoolThreads, unlike the old cached pool
    val saved = HttpApi.MaxInflight
    HttpApi.MaxInflight = 8
    val pool = Executors.newFixedThreadPool(40)
    try {
      val results = (1 to 40).map { _ =>
        pool.submit[(Int, String)] { () => get(slowQuery) }
      }
      // the observability endpoints are EXEMPT from shedding: a
      // scrape mid-flood must answer (it reports the overload)
      Thread.sleep(300)
      val (mc, mb) = get("/metrics")
      assert(mc == 200 && mb.contains("graft_api_gate_free_slots"),
        s"metrics unavailable during flood: $mc")
      val done = results.map(_.get(120, TimeUnit.SECONDS))
      val ok = done.count(_._1 == 200)
      val shed = done.filter(_._1 == 503)
      assert(shed.nonEmpty, s"no request was shed: ${done.map(_._1)}")
      assert(shed.forall(_._2 ==
        """{"status":"error","errorType":"unavailable",""" +
          """"error":"server overloaded"}"""), shed.head._2)
      // the gate was never starved: every request under the cap ran
      // to completion. No UPPER bound on ok — a straggling connection
      // dispatched after an early admitted request finishes is
      // legitimately admitted too (in-flight is a live count, not a
      // per-burst quota), so asserting ok <= MaxInflight would be a
      // timing-dependent flake (r7 advice)
      assert(ok >= 1, s"expected at least one success, got $ok")
      assert(ok + shed.size == 40)
    } finally {
      HttpApi.MaxInflight = saved
      pool.shutdownNow()
    }
  }

  test("an unparseable ?timeout= is bad_data with the verbatim " +
      "duration diagnostic (api.go:217-227)") {
    val (code, body) = get(s"$slowQuery&timeout=bogus")
    assert(code == 400, s"$code $body")
    assert(body == """{"status":"error","errorType":"bad_data",""" +
      """"error":"cannot parse \"bogus\" to a valid duration"}""", body)
  }
}

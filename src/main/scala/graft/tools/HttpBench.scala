package graft.tools

import java.net.{HttpURLConnection, URI, URLEncoder}

import org.apache.spark.sql.SparkSession

import graft.api.HttpApi
import graft.exec.PromQLEngine
import graft.model.Samples

/** HTTP-layer throughput bench (r13): the engine-level `instant_qps`
  * figure (graft.Bench) deliberately excludes the serving stack — this
  * tool measures the SAME light/mixed query mix through the full HTTP
  * path (`/api/v1/query` + `/query_range`: admission gate, PromQL
  * parse, engine, `collectRows`, JSON render, socket) against an
  * in-process [[HttpApi]], so the reference's ≥5 q/s envelope (an
  * HTTP-serving number, `docs/assumptions.md:48`) gets a like-for-like
  * reading.
  *
  * Protocol mirrors Bench's qps section: 8 light client threads for
  * ~5 s windows, light-only and mixed (heavy `/query_range` clients
  * saturating alongside), three interleaved draws each, best-of
  * reported. A final render probe times ONE heavy `/query_range`
  * response end-to-end vs the same query collected engine-side — the
  * difference is the serialization + JSON cost `HttpApi.collectRows`
  * adds on a range-shaped payload.
  *
  * Usage: runMain graft.tools.HttpBench [sfDir] [windowSec]
  */
object HttpBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // WRITE soak (r14): `runMain graft.tools.HttpBench _ _ writesoak
    // [minutes]` — the table-backed production write loop under
    // sustained churn: one writer posting a fresh batch every ~2 s
    // (dedup → append → chunk cut → index upsert → INCREMENTAL rung
    // merge → engine swap) while 4 light query clients run against
    // whatever engine is current. Prints writes + query qps per
    // minute; a decaying series here would be an engine-swap-path
    // leak (cached frames/pools surviving swapped-out engines) — the
    // class of bug the read soak caught in the FAIR pool registry.
    if (args.length > 2 && args(2) == "writesoak") {
      writeSoak(if (args.length > 3) args(3).toInt else 5)
      return
    }
    // SERVING-DAY rung soak (r15): `runMain graft.tools.HttpBench _ _
    // rungsoak [batches] [samplesPerBatch]` — the r14 writesoak's 200-
    // sample batches measured scheduling floors, not the merge; this
    // drives forTable's sink at REAL batch sizes (default 96 × 2 M
    // samples, all into ONE UTC date — a serving day at a batch per
    // 15 min) through HttpApi.writeDirect while 4 query clients run.
    // Per-batch write seconds + query qps per batch window; a GROWING
    // write series would mean a volume-coupled term survived the
    // incremental merge.
    // r16: `... rungsoak [batches] [samplesPerBatch] [nochunks|chunks]
    // [days]` — a MULTI-DAY serving soak (date rollover mid-soak): the
    // r15 sweep bug (per-write cost growing with the number of date=
    // dirs) hid in every single-date soak's blind spot, so the series
    // to watch is per-write cost FLAT across days and compactions
    // firing per-date geometrically.
    if (args.length > 2 && args(2) == "rungsoak") {
      rungSoak(
        if (args.length > 3) args(3).toInt else 96,
        if (args.length > 4) args(4).toInt else 2000000,
        chunks = !(args.length > 5 && args(5) == "nochunks"),
        soakDays = if (args.length > 6) args(6).toInt else 1)
      return
    }
    // TABLE-AGE A/B (r16): `... sweepage [dates] [writes] [perBatch]`
    // — per-write cost must be independent of how many date partitions
    // the table has ACCUMULATED (the r15 sweeps listed every date= dir
    // of both tiers per write; a year of retention ≈ 730 listings per
    // batch). Pre-seeds `dates` one-file partitions, then drives
    // `writes` identical batches into one fresh date — run at dates=1
    // and dates=730 and compare the per-write series.
    if (args.length > 2 && args(2) == "sweepage") {
      sweepAge(
        if (args.length > 3) args(3).toInt else 730,
        if (args.length > 4) args(4).toInt else 20,
        if (args.length > 5) args(5).toInt else 100000)
      return
    }
    val windowSec = if (args.length > 1) args(1).toLong else 5L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new PromQLEngine(spark, Samples.fromEventsDir(spark, sfDir))
    val api = new HttpApi(spark, engine, None, 0)
    val port = api.start()
    val base = s"http://127.0.0.1:$port"

    /** GET, draining the body; returns (status, bytes read). */
    def get(path: String): (Int, Int) = {
      val conn = new URI(base + path).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(600000)
      try {
        val code = conn.getResponseCode
        val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
        var total = 0
        if (in != null) {
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { total += n; n = in.read(buf) }
          in.close()
        }
        (code, total)
      } finally conn.disconnect()
    }

    def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
    // the Bench lightNames mix, expressed as API calls (p2's selector,
    // a label-values scan, a series scan, a constant-time expression)
    val instantQ = enc("""events_value{event_type=~"click|view"}""")
    val light = Seq(
      s"/api/v1/query?query=$instantQ&time=1704153600",
      "/api/v1/label/event_type/values",
      s"/api/v1/query?query=$instantQ&time=1704240000",
      s"/api/v1/query?query=${enc("time()")}&time=1704153600")
    val heavyPath = s"/api/v1/query_range?query=${enc(
      "sum by (event_type) (count_over_time(events_value[6h]))")}" +
      "&start=1704844800&end=1704931200&step=300"

    // warmup: every light URL + one heavy range (plan/codegen caches)
    light.foreach(get)
    get(heavyPath)

    def runQps(heavy: Int, winSec: Long = windowSec): Double = {
      val stopAt = System.nanoTime() + winSec * 1000L * 1000L * 1000L
      val done = new java.util.concurrent.atomic.AtomicLong(0)
      val lightThreads = (0 until 8).map { k =>
        new Thread(() => {
          var i = k
          while (System.nanoTime() < stopAt) {
            // only a 200 counts as a completion
            try if (get(light(i % light.length))._1 == 200)
              done.incrementAndGet()
            catch { case _: Throwable => () }
            i += 1
          }
        })
      }
      val heavyThreads = (0 until heavy).map { _ =>
        new Thread(() => {
          while (System.nanoTime() < stopAt) {
            try get(heavyPath) catch { case _: Throwable => () }
          }
        })
      }
      val t0 = System.nanoTime()
      (lightThreads ++ heavyThreads).foreach(_.start())
      (lightThreads ++ heavyThreads).foreach(_.join())
      done.get().toDouble / ((System.nanoTime() - t0) / 1e9)
    }

    // r14 SOAK mode (`runMain graft.tools.HttpBench <sf> <win> soak
    // [minutes]`): drive the mixed load against ONE engine for N
    // minutes and print qps per minute — the serving stack implicitly
    // claims a flat series (plan LRU 64, labelValues memo, PlanCache
    // bounded), and nothing else tests a long session. A decaying
    // series here would be the session-state bug the r13 driver's qps
    // collapse suggested (two fresh-JVM re-runs showed no decay; this
    // is the sustained-load complement).
    if (args.length > 2 && args(2) == "soak") {
      val minutes = if (args.length > 3) args(3).toInt else 10
      val perMin = (0 until minutes).map { m =>
        val q = runQps(2, winSec = 60)
        println(s"soak minute ${m + 1}: ${math.rint(q * 100) / 100} q/s")
        q
      }
      def r2s(x: Double): Double = math.rint(x * 100) / 100
      println(s"""{"soak_minutes":$minutes,"soak_qps_per_min":${perMin
        .map(r2s).mkString("[", ",", "]")},"sf":"${sfDir
        .split('/').last}"}""")
      spark.stop()
      sys.exit(0)
    }

    // interleaved draws (the Bench discipline): light, mixed, ×3 —
    // and (r14) each half probe-bracketed like graft.Bench's qps
    // section: a half whose pre/post calibration ratio exceeds 1.5×
    // baseline is discarded and redrawn (≤2 retries), and the
    // accepted ratio is printed with the window (the first sliding
    // run showed windows decaying 101→84→64 with no way to tell storm
    // from regression — same artifact gap the driver bench closed)
    (0 until 3).foreach(_ => graft.Bench.probeOnce())
    val probeBaseline = Seq.fill(7)(graft.Bench.probeOnce()).min
    def bracketed(f: => Double): (Double, Double) = {
      var pre = graft.Bench.probeOnce() / probeBaseline
      var q = f
      var post = graft.Bench.probeOnce() / probeBaseline
      var ratio = math.max(pre, post)
      var retries = 0
      while (ratio > 1.5 && retries < 2) {
        System.gc(); Thread.sleep(250); retries += 1
        pre = graft.Bench.probeOnce() / probeBaseline
        q = f
        post = graft.Bench.probeOnce() / probeBaseline
        ratio = math.max(pre, post)
      }
      (q, ratio)
    }
    val windows = (0 until 3).map(_ =>
      (bracketed(runQps(0)), bracketed(runQps(2))))
    val lightQps = windows.map(_._1._1).max
    val mixedQps = windows.map(_._2._1).max

    // r14: the SLIDING-dashboard client — the Grafana refresh shape
    // the r13 verdict flagged as the plan cache's blind spot: fixed
    // duration (24 h) and step (300 s), start/end ADVANCING one step
    // per request, step-aligned, per-thread phase-shifted. Every
    // request is a never-seen exact (query, start, end, step) key, so
    // this measures the cache-MISS steady state (parse + plan + eval
    // + render per request) that the exact-repeat windows above
    // deliberately avoid.
    def slidingAt(startSec: Long): String =
      s"/api/v1/query_range?query=${enc(
        "sum by (event_type) (count_over_time(events_value[6h]))")}" +
        s"&start=$startSec&end=${startSec + 86400}&step=300"
    def runSlidingQps(): Double = {
      val stopAt = System.nanoTime() + windowSec * 1000L * 1000L * 1000L
      val done = new java.util.concurrent.atomic.AtomicLong(0)
      val ts = (0 until 8).map { k =>
        new Thread(() => {
          // distinct per-thread phase, step-aligned, inside the data's
          // 30-day span so every response carries real rows
          var s0 = 1704153600L + k * 7 * 300L
          while (System.nanoTime() < stopAt) {
            try if (get(slidingAt(s0))._1 == 200) done.incrementAndGet()
            catch { case _: Throwable => () }
            s0 += 300
          }
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      done.get().toDouble / ((System.nanoTime() - t0) / 1e9)
    }
    runSlidingQps() // warmup (JIT on the miss path)
    val slidingQps = Seq.fill(3)(bracketed(runSlidingQps())._1).max

    // render probe: the full heavy range via HTTP vs engine-side
    // collect of the same frame (3 draws each, min — uncontended cost)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // cold = never-seen (query, window) key — pays parse + plan + eval
    // + render; warm = exact repeat — the serving plan cache (r13)
    // skips planning, so warm ≈ eval + render
    def heavyAt(startSec: Long): String =
      s"/api/v1/query_range?query=${enc(
        "sum by (event_type) (count_over_time(events_value[6h]))")}" +
        s"&start=$startSec&end=${startSec + 86400}&step=300"
    val httpRangeCold = Seq(1704153600L, 1704240000L, 1704326400L)
      .map(s0 => time {
        val (c, n) = get(heavyAt(s0))
        require(c == 200 && n > 0, s"heavy range failed: $c")
      }).min
    val httpRange = Seq.fill(3)(time {
      val (c, n) = get(heavyPath)
      require(c == 200 && n > 0, s"heavy range failed: $c")
    }).min
    val rq = "sum by (event_type) (count_over_time(events_value[6h]))"
    // fresh-plan: what each HTTP request actually pays (parse + plan +
    // eval + collect); reused-plan: eval + collect only — the spread
    // between the three figures decomposes the serving cost into
    // per-request planning vs JSON render/socket
    val engFresh = Seq.fill(3)(time {
      engine.rangeQuery(rq, 1704844800000L, 1704931200000L, 300000L)
        .collect()
    }).min
    val rangeDf = engine.rangeQuery(rq, 1704844800000L, 1704931200000L,
      300000L)
    rangeDf.collect()
    val engReused = Seq.fill(3)(time { rangeDf.collect() }).min
    val rows = rangeDf.count()

    def r2(x: Double): Double = math.rint(x * 100) / 100
    println(s"""{"http_light_qps":${r2(lightQps)},"http_mixed_qps":${r2(
      mixedQps)},"sliding_range_qps":${r2(slidingQps)},"range_http_cold_sec":${r2(
      httpRangeCold)},"range_http_warm_sec":${r2(
      httpRange)},"range_engine_fresh_sec":${r2(
      engFresh)},"range_engine_reused_sec":${r2(
      engReused)},"range_rows":$rows,"windows":${windows.map {
      case ((l, lr), (m, mr)) =>
        s"[${r2(l)},${r2(m)},${r2(lr)},${r2(mr)}]"
    }.mkString("[", ",", "]")},"sf":"${sfDir
      .split('/').last}"}""")
    spark.stop()
    sys.exit(0)
  }

  /** Ask #5 (r15): a full serving day of REAL-sized batches through
    * the production write path — `HttpApi.writeDirect` runs the exact
    * forTable sink (dedup → append → chunk cut → index upsert →
    * incremental rung merge → engine swap) per batch, with 4 HTTP
    * query clients live against whatever engine is current. All
    * batches land in ONE UTC date so the rung partitions being merged
    * into keep GROWING — the shape that exposed the pre-r14 refold's
    * volume coupling (IngestBench A/B), now witnessed end-to-end. */
  private def rungSoak(batches: Int, perBatch: Int,
      chunks: Boolean, soakDays: Int = 1): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("rung-soak-table").toString
    val api = HttpApi.forTable(spark, path,
      rollups = Seq(3600000L, 86400000L), chunks = chunks)
    val port = api.start()
    val base = s"http://127.0.0.1:$port"
    def get(p: String): Int = {
      val conn = new URI(base + p).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000); conn.setReadTimeout(600000)
      try {
        val c = conn.getResponseCode
        val in = if (c >= 400) conn.getErrorStream else conn.getInputStream
        if (in != null) { in.readAllBytes(); in.close() }
        c
      } finally conn.disconnect()
    }
    // IngestBench's generator shape (10k series, consecutive windows)
    // at 1 s cadence so a 96 × 2 M day fits one UTC date: each batch
    // covers perBatch/nSeries seconds
    val nSeries = 10000
    val baseMs = 1704067200000L // 2024-01-01, midnight UTC
    val winMs = (perBatch / nSeries) * 1000L
    require(soakDays >= 1 && batches % soakDays == 0,
      "days must divide batches evenly")
    val perDay = batches / soakDays
    require(perDay.toLong * winMs < 86400000L,
      "a day's batches must stay inside one UTC date — lower " +
        "batches/day or perBatch")
    // multi-day shape (r16): batch b lands in UTC day b/perDay at
    // in-day slot b%perDay — consecutive windows within each day,
    // hard date rollover between them
    def batchBase(b: Int): Long =
      baseMs + (b / perDay).toLong * 86400000L + (b % perDay).toLong * winMs
    def batchDf(b: Int) = spark.range(perBatch).select(
      map(
        lit("__name__"), lit("rs_m"),
        lit("instance"), concat(lit("inst-"), (col("id") % nSeries)),
        lit("job"), lit("rungsoak"),
        lit("shard"), (col("id") % 4).cast("string")
      ).as("labels"),
      (lit(batchBase(b)) +
        (col("id") / nSeries).cast("long") * 1000L).as("t"),
      (col("id") % 97).cast("double").as("v"),
      lit(false).as("stale"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val head = new java.util.concurrent.atomic.AtomicLong(baseMs)
    val qp = java.net.URLEncoder.encode(
      """rs_m{instance=~"inst-1|inst-2|inst-3"}""", "UTF-8")
    val readers = (0 until 4).map { k =>
      new Thread(() => {
        while (!stop.get()) {
          val t = head.get() / 1000
          // connection teardown races api.stop() at exit — benign
          try {
            if (get(s"/api/v1/query?query=$qp&time=$t") == 200)
              reads.incrementAndGet()
          } catch { case _: java.io.IOException => () }
          // dashboard cadence, NOT a tight loop: unthrottled clients
          // under FAIR scheduling starve a 2 M-row write into minutes
          // (measured: batch 0 got ~1 CPU-min in 17 wall-min against
          // 4 spinning readers) — the soak measures write-cost SHAPE
          // with queries live, not peak read qps (the read soak does)
          Thread.sleep(250)
        }
      })
    }
    readers.foreach { t => t.setDaemon(true); t.start() }
    val rows = (0 until batches).map { b =>
      val r0 = reads.get()
      val t0 = System.nanoTime()
      api.writeDirect(batchDf(b))
      val sec = (System.nanoTime() - t0) / 1e9
      head.set(batchBase(b) + winMs)
      val qps = (reads.get() - r0) / sec
      // cumulative compaction counters: the r16 compactor runs OFF the
      // write path, so the series to read is (flat write seconds,
      // geometric per-date compaction cadence) — not write spikes
      val sc = api.sampleCompactionCount
      val cc = api.chunkCompactionCounts._1
      println(f"rungsoak batch $b (day ${b / perDay}): $perBatch samples " +
        f"in $sec%.2f s (${perBatch / sec / 1e6}%.2f M/s), queries " +
        f"$qps%.1f q/s, compactions s=$sc c=$cc" +
        (if (b == 0) " (cold)" else ""))
      (math.rint(sec * 100) / 100, math.rint(qps * 10) / 10, sc, cc)
    }
    stop.set(true)
    // drain the background compactor before the summary so the final
    // counters cover work still in flight at the last batch
    api.awaitCompactions()
    println(s"""{"rungsoak_batches":$batches,"samples_per_batch":$perBatch,"chunks":$chunks,"days":$soakDays,"write_sec":${rows
      .map(_._1).mkString("[", ",", "]")},"query_qps":${rows
      .map(_._2).mkString("[", ",", "]")},"sample_compactions":${rows
      .map(_._3).mkString("[", ",", "]")},"chunk_compactions":${rows
      .map(_._4).mkString("[", ",", "]")}}""")
    api.stop()
    spark.stop()
    sys.exit(0)
  }

  /** Table-age A/B (r16 verdict item 1's done-criterion): the write
    * path's per-batch cost must carry NO term in the table's date
    * count. Seeds `dates` single-file date partitions (file copies of
    * one tiny appended batch — content irrelevant, the measurement is
    * metadata cost), opens the full-tier server over the aged table,
    * then times `writes` identical batches into one fresh date.
    * Compare the series at dates=1 vs dates=730: the r15 sweeps would
    * add two full-root listings per write (every `date=` dir of the
    * samples table and the chunk store); the r16 background compactor
    * checks only the batch's own dates, so the series must match. */
  private def sweepAge(dates: Int, writes: Int, perBatch: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.storage.Ingest
    val path = java.nio.file.Files
      .createTempDirectory("sweep-age-table").toString
    val baseMs = 1704067200000L // 2024-01-01 UTC
    val dayMs = 86400000L
    // one real appended batch gives the template partition files
    val seed = spark.range(100).select(
      map(lit("__name__"), lit("seed_m"),
        lit("k"), col("id").cast("string")).as("labels"),
      lit(baseMs).as("t"), col("id").cast("double").as("v"),
      lit(false).as("stale"))
    Ingest.append(seed, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    val srcPart = new org.apache.hadoop.fs.Path(root, "date=2024-01-01")
    val srcFiles = fs.listStatus(srcPart)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    (1 until dates).foreach { d =>
      val date = java.time.Instant.ofEpochMilli(baseMs + d * dayMs)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.format(fmt)
      val dst = new org.apache.hadoop.fs.Path(root, s"date=$date")
      fs.mkdirs(dst)
      srcFiles.foreach { f =>
        org.apache.hadoop.fs.FileUtil.copy(fs, f, fs,
          new org.apache.hadoop.fs.Path(dst, f.getName), false, conf)
      }
    }
    val api = graft.api.HttpApi.forTable(spark, path, chunks = true)
    api.start()
    // the measured writes land in a FRESH date past the seeded range
    val nSeries = 1000
    val writeBase = baseMs + (dates.toLong + 2) * dayMs
    def batchDf(b: Int) = spark.range(perBatch).select(
      map(lit("__name__"), lit("sw_m"),
        lit("instance"), concat(lit("i-"), (col("id") % nSeries))).as("labels"),
      (lit(writeBase + b.toLong * 600000L) +
        (col("id") / nSeries).cast("long") * 1000L).as("t"),
      (col("id") % 97).cast("double").as("v"),
      lit(false).as("stale"))
    val secs = (0 until writes).map { b =>
      val t0 = System.nanoTime()
      api.writeDirect(batchDf(b))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"sweepage write $b ($dates dates): $sec%.2f s")
      math.rint(sec * 100) / 100
    }
    api.awaitCompactions()
    val warm = secs.drop(2)
    println(s"""{"sweepage_dates":$dates,"writes":$writes,"per_batch":$perBatch,"write_sec":${secs
      .mkString("[", ",", "]")},"warm_mean":${math.rint(
      warm.sum / warm.size * 1000) / 1000}}""")
    api.stop()
    spark.stop()
    sys.exit(0)
  }

  private def writeSoak(minutes: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files
      .createTempDirectory("write-soak-table").toString
    val api = HttpApi.forTable(spark, path,
      rollups = Seq(3600000L), chunks = true)
    val port = api.start()
    val base = s"http://127.0.0.1:$port"
    def post(p: String, body: String): Int = {
      val conn = new URI(base + p).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setConnectTimeout(10000); conn.setReadTimeout(600000)
      try {
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        val c = conn.getResponseCode
        val in = if (c >= 400) conn.getErrorStream else conn.getInputStream
        if (in != null) { in.readAllBytes(); in.close() }
        c
      } finally conn.disconnect()
    }
    def get(p: String): Int = {
      val conn = new URI(base + p).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(10000); conn.setReadTimeout(600000)
      try {
        val c = conn.getResponseCode
        val in = if (c >= 400) conn.getErrorStream else conn.getInputStream
        if (in != null) { in.readAllBytes(); in.close() }
        c
      } finally conn.disconnect()
    }
    // one batch = 50 series × 4 fresh 15s-cadence points, all inside
    // one UTC date — the dashboard-agent write shape; timestamps
    // advance so every batch extends the same rung partitions
    val t0Ms = 1704067200000L
    def batch(n: Int): String =
      (0 until 50).flatMap { s =>
        (0 until 4).map { i =>
          val t = t0Ms + (n.toLong * 4 + i) * 15000L
          s"""{"labels":{"__name__":"ws_m","s":"s$s"},"t":$t,"v":${(n * 4 + i) % 97}}"""
        }
      }.mkString("\n")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writes = new java.util.concurrent.atomic.AtomicLong(0)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val writeErr = new java.util.concurrent.atomic.AtomicLong(0)
    val writer = new Thread(() => {
      var n = 0
      while (!stop.get()) {
        if (post("/api/v1/write", batch(n)) == 200) writes.incrementAndGet()
        else writeErr.incrementAndGet()
        n += 1
        Thread.sleep(2000)
      }
    })
    val qp = java.net.URLEncoder.encode("""ws_m{s=~"s1|s2|s3"}""", "UTF-8")
    val readers = (0 until 4).map { k =>
      new Thread(() => {
        var i = k
        while (!stop.get()) {
          // query AT the advancing write head so the lookback window
          // always holds fresh samples (exercises the swapped engine)
          val t = (t0Ms + writes.get() * 4 * 15000L) / 1000
          if (get(s"/api/v1/query?query=$qp&time=$t") == 200)
            reads.incrementAndGet()
          i += 1
        }
      })
    }
    post("/api/v1/write", batch(1000000)) // prime tiers before timing
    (writer +: readers).foreach { t => t.setDaemon(true); t.start() }
    val perMin = (0 until minutes).map { m =>
      val w0 = writes.get(); val r0 = reads.get()
      Thread.sleep(60000)
      val w = writes.get() - w0; val r = (reads.get() - r0) / 60.0
      println(s"writesoak minute ${m + 1}: $w writes, " +
        s"${math.rint(r * 100) / 100} query q/s, errors ${writeErr.get()}")
      (w, math.rint(r * 100) / 100)
    }
    stop.set(true)
    println(s"""{"writesoak_minutes":$minutes,"writes_per_min":${perMin
      .map(_._1).mkString("[", ",", "]")},"query_qps_per_min":${perMin
      .map(_._2).mkString("[", ",", "]")},"write_errors":${writeErr
      .get()}}""")
    api.stop()
    spark.stop()
    sys.exit(0)
  }
}

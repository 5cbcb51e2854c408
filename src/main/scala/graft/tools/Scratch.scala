package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently (r16): decompose
  * the d6/d9 connected-components rows — per-round cost of the
  * alternating-star loop vs the surrounding label joins.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // ---- d15 phase decomposition ----
    locally {
      val threshold = 0.6
      val sets = graft.llm.Dedup.shingleSetsCached(docs, 3)
      println(f"sets: ${time(sets.count())}%.3f s n=${sets.count()}")
      val sh = sets.select(col("id"), col("nsh"), explode(col("hs")).as("s"))
      println(f"sh: ${time(sh.count())}%.3f s n=${sh.count()}")
      val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      println(f"dfreq: ${time(dfreq.count())}%.3f s")
      import org.apache.spark.sql.expressions.Window
      val prefix = sh.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
        .where(col("rk") <= (col("nsh") -
          ceil(lit(threshold) * col("nsh") - lit(1e-9)) + 1).cast("int"))
        .select(col("id"), col("nsh"), col("s"))
      println(f"prefix: ${time(prefix.count())}%.3f s n=${prefix.count()}")
      val cand0 = prefix.as("p").join(sh.as("f"),
          col("p.s") === col("f.s") && col("p.id") =!= col("f.id") &&
            (col("p.nsh") < col("f.nsh") ||
              (col("p.nsh") === col("f.nsh") && col("p.id") < col("f.id"))))
        .select(least(col("p.id"), col("f.id")).as("ia"),
          greatest(col("p.id"), col("f.id")).as("ib"))
      println(f"cand raw: ${time(cand0.count())}%.3f s n=${cand0.count()}")
      val cand = cand0.distinct()
      println(f"cand distinct: ${time(cand.count())}%.3f s n=${cand.count()}")
      (1 to 3).foreach { i =>
        println(f"d15 full (run $i): ${time(
          graft.llm.Dedup.containmentPrefixPairs(docs, 3, 0.6).count())}%.3f s")
      }
      // planning-vs-execution split: executedPlan forces analysis +
      // optimization + physical planning without running a job
      (1 to 3).foreach { i =>
        val df = graft.llm.Dedup.containmentPrefixPairs(docs, 3, 0.6)
        val tPlan = time(df.queryExecution.executedPlan)
        val tExec = time(df.count())
        println(f"d15 plan=$tPlan%.3f s exec=$tExec%.3f s (run $i)")
      }
      // isolated phases over checkpointed inputs (warm, 2nd of 2 draws)
      val shC = sh.localCheckpoint()
      val prefC = prefix.localCheckpoint()
      (1 to 2).foreach { i =>
        println(f"  phase prefix-only: ${time(prefix.count())}%.3f s")
      }
      val candIso = prefC.as("p").join(shC.as("f"),
          col("p.s") === col("f.s") && col("p.id") =!= col("f.id") &&
            (col("p.nsh") < col("f.nsh") ||
              (col("p.nsh") === col("f.nsh") && col("p.id") < col("f.id"))))
        .select(least(col("p.id"), col("f.id")).as("ia"),
          greatest(col("p.id"), col("f.id")).as("ib"))
        .distinct()
      (1 to 2).foreach { i =>
        println(f"  phase cand-only: ${time(candIso.count())}%.3f s")
      }
      val candC = candIso.localCheckpoint()
      val verifyIso = candC
        .join(sets.select(col("id").as("ia"), col("hs").as("ha"),
          col("nsh").as("na")), Seq("ia"))
        .join(sets.select(col("id").as("ib"), col("hs").as("hb"),
          col("nsh").as("nb")), Seq("ib"))
        .withColumn("inter", size(array_intersect(col("ha"), col("hb"))))
        .withColumn("containment",
          greatest(col("inter").cast("double") / col("na").cast("double"),
            col("inter").cast("double") / col("nb").cast("double")))
        .filter(col("containment") >= 0.6)
      (1 to 2).foreach { i =>
        println(f"  phase verify-only: ${time(verifyIso.count())}%.3f s")
      }
      val verifyNative = candC
        .join(sets.select(col("id").as("ia"), col("hs").as("ha"),
          col("nsh").as("na")), Seq("ia"))
        .join(sets.select(col("id").as("ib"), col("hs").as("hb"),
          col("nsh").as("nb")), Seq("ib"))
        .withColumn("inter",
          graft.functions.SortedIntersectCount(col("ha"), col("hb")))
        .withColumn("containment",
          greatest(col("inter").cast("double") / col("na").cast("double"),
            col("inter").cast("double") / col("nb").cast("double")))
        .filter(col("containment") >= 0.6)
      (1 to 2).foreach { i =>
        println(f"  phase verify-native: ${time(verifyNative.count())}%.3f s")
      }
      // prefix via hash agg + per-doc array sort instead of the
      // sort-based window
      val prefLen = (col("nsh") -
        ceil(lit(threshold) * col("nsh") - lit(1e-9)) + 1).cast("int")
      val prefixAgg = sh.join(dfreq, "s")
        .groupBy(col("id"))
        .agg(first(col("nsh")).as("nsh"),
          collect_list(struct(col("df"), col("s"))).as("_ps"))
        .select(col("id"), col("nsh"),
          slice(array_sort(col("_ps")), lit(1), greatest(prefLen, lit(1))).as("_pref"))
        .select(col("id"), col("nsh"), explode(col("_pref")).as("_p"))
        .select(col("id"), col("nsh"), col("_p.s").as("s"))
      (1 to 2).foreach { i =>
        println(f"  phase prefix-agg: ${time(prefixAgg.count())}%.3f s n=${prefixAgg.count()}")
      }
    }
    val pairs = graft.llm.Dedup
      .ngramJaccardPairsCached(docs, 3, 0.5)
      .select(col("ia"), col("ib"))
    println(f"pairs build+count: ${time(pairs.count())}%.3f s  n=${pairs.count()}")
    // warm
    (1 to 2).foreach { i =>
      println(f"cc full (run $i): ${time(
        graft.llm.Dedup.connectedComponents(pairs).count())}%.3f s")
    }
    // replicate the CC loop with per-round timing
    def ccTimed(): Unit = {
      var edges = pairs.select(
          greatest(col("ia"), col("ib")).as("u"),
          least(col("ia"), col("ib")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)
      def probe(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      def largeStar(e: org.apache.spark.sql.DataFrame) = {
        val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        val mins = sym.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
        sym.join(mins, "u").filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")).distinct()
      }
      def smallStar(e: org.apache.spark.sql.DataFrame) = {
        val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
        e.join(mins, "u").filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins.select(col("u"), col("m").as("v"))).distinct()
      }
      var t0 = System.nanoTime()
      var sig = probe(edges)
      println(f"  init probe: ${(System.nanoTime()-t0)/1e9}%.3f s n=${sig._1}")
      var round = 0
      var converged = sig._1 == 0L
      while (!converged && round < 50) {
        t0 = System.nanoTime()
        val next = smallStar(largeStar(edges)).localCheckpoint(false)
        val nextSig = probe(next)
        println(f"  round $round: ${(System.nanoTime()-t0)/1e9}%.3f s n=${nextSig._1}")
        edges.unpersist(); edges = next
        converged = nextSig == sig; sig = nextSig; round += 1
      }
    }
    (1 to 2).foreach { i => println(s"cc timed run $i:"); ccTimed() }
    // d6 end-to-end
    (1 to 2).foreach { i =>
      println(f"d6 dupClusters (run $i): ${time(
        graft.llm.Dedup.dupClusters(docs, pairs).count())}%.3f s")
    }
    spark.stop()
  }
}

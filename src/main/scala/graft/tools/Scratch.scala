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

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: A/B the r13
  * Lloyd rewrite (native NearestCentroid + one (cluster,dim)
  * aggregate) against the r12 shape (boxed per-row UDF + 64 avg
  * columns) on the same corpus and seed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf0.1x10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dim = 64
    val p = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v")).cache()
    p.count()
    val n = p.count()
    val k = math.max(16, (n * 2 / 250).toInt)
    println(s"n=$n k=$k")
    var cents = p.orderBy(xxhash64(col("id"), lit(11L))).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray).zipWithIndex.map(_.swap)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // OLD shape: boxed UDF assignment + 64 avg columns
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    val centsLocal = cents
    val oldAssign = udf { (v: Array[Double]) =>
      var best = -1; var bestD = Double.MaxValue
      centsLocal.foreach { case (ci, c) =>
        val d = sqDist(c, v)
        if (d < bestD) { bestD = d; best = ci }
      }
      best
    }
    def oldIter(): Unit = p.withColumn("_c", oldAssign(col("v")))
      .select(col("_c") +:
        (0 until dim).map(i => element_at(col("v"), i + 1).as(s"d$i")): _*)
      .groupBy(col("_c"))
      .agg(avg(col("d0")).as("m0"),
        (1 until dim).map(i => avg(col(s"d$i")).as(s"m$i")): _*)
      .collect()
    // NEW shape: native codegen argmin + one (cluster, pos) aggregate
    val ids = cents.map(_._1); val cvs = cents.map(_._2)
    def newIter(): Unit = p
      .select(graft.functions.NearestCentroid(col("v"), ids, cvs).as("_c"),
        col("v"))
      .select(col("_c"), posexplode(col("v")).as(Seq("_p", "_x")))
      .groupBy(col("_c"), col("_p"))
      .agg(avg(col("_x")).as("_m"))
      .collect()
    oldIter(); newIter() // warm codegen
    val oldT = Seq.fill(3)(time(oldIter())).min
    val newT = Seq.fill(3)(time(newIter())).min
    println(f"old Lloyd iter: $oldT%.2f s   new Lloyd iter: $newT%.2f s")
    spark.stop()
  }
}

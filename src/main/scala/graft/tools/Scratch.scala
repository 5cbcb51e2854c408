package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: repeated-run
  * timing decomposition of composite bench entries (c1/c2) to separate
  * plan cost from one-off/JIT noise.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (name <- Seq("c1_topk_rate", "c2_rate_share", "j1_binop_ratio")) {
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 6).map(_ => time(fn(spark, sfDir).count()))
      println(f"$name: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}

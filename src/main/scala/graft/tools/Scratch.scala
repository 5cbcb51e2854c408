package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  -> $r")
    }
    val q = SparkEntry.queries
    for (round <- 1 to 5)
      for (name <- Seq("c2_rate_share", "c1_topk_rate"))
        t(s"r$round $name") { q(name)(spark, dir).count() }
    spark.stop()
  }
}

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
    for (round <- 1 to 3)
      for (name <- Seq("p7_fine_grid", "t18_cross_overlap", "t16_importance", "t17_chunk"))
        t(s"r$round $name") { q(name)(spark, dir).count() }
    spark.stop()
  }
}

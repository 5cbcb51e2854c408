package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: evaluate an
  * 11k-step time() range the way the API boundary test does. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = Seq((Map("__name__" -> "x"), 0L, 1.0)).toDF("labels", "t", "v")
    val eng = new graft.exec.PromQLEngine(spark,
      base.withColumn("sig", graft.model.Samples.sigExpr(org.apache.spark.sql.functions.col("labels")))
        .withColumn("stale", org.apache.spark.sql.functions.lit(false)))
    try {
      val n = eng.rangeQuery("time()", 0L, 11000000L, 1000L).collect().length
      println(s"OK rows=$n")
    } catch { case e: Throwable => println(s"FAIL: ${e}"); e.printStackTrace() }
    spark.stop()
  }
}

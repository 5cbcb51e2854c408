package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.exec.PromQLEngine

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = 60000L
    val rows = (0 to 100).flatMap { k =>
      Seq(
        Row(Map("__name__" -> "tm", "foo" -> "bar"), k * m, k * 100.0, false),
        Row(Map("__name__" -> "tm", "foo" -> "boo"), k * m, 1.0, false))
    }
    val schema = StructType(Seq(
      StructField("labels", MapType(StringType, StringType), false),
      StructField("t", LongType, false),
      StructField("v", DoubleType, false),
      StructField("stale", BooleanType, false)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val e = new PromQLEngine(spark, df)
    val q = e.instant("sum by (foo) (tm) / on() group_left sum(tm)", 2 * m)
    val plan = q.queryExecution.optimizedPlan.toString
    println("max_by count: " + "max_by".r.findAllIn(plan).size)
    println("Aggregate count: " + "Aggregate ".r.findAllIn(plan).size)
    q.show(false)
    spark.stop()
  }
}

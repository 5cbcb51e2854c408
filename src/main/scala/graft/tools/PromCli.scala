package graft.tools

import org.apache.spark.sql.SparkSession
import graft.exec.PromQLEngine
import graft.model.Samples

/** CLI query runner — the library's equivalent of the reference's
  * `/api/v1/query` + `/query_range` entry points, over the driver test
  * tables.
  *
  * Usage:
  *   runMain graft.tools.PromCli <sfDir> instant '<promql>' <tsMs>
  *   runMain graft.tools.PromCli <sfDir> range '<promql>' <startMs> <endMs> <stepMs>
  */
object PromCli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val samples = Samples.fromEventsDir(spark, args(0))
      val engine = new PromQLEngine(spark, samples)
      val df = args(1) match {
        case "instant" => engine.instant(args(2), args(3).toLong)
        case "range" =>
          engine.rangeQuery(args(2), args(3).toLong, args(4).toLong, args(5).toLong)
        case other => sys.error(s"unknown mode $other")
      }
      df.orderBy("t").show(50, truncate = false)
      println(s"rows=${df.count()}")
    } finally spark.stop()
  }
}

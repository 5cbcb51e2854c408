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
  *
  * With `--http` the query is routed through a real in-process
  * [[graft.api.HttpApi]] server (ephemeral port) and the raw JSON
  * envelope is printed — exercising the full parse → guard → engine →
  * envelope stack exactly as an external client would see it. */
object PromCli {
  def main(argv: Array[String]): Unit = {
    val http = argv.contains("--http")
    val args = argv.filterNot(_ == "--http")
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
      if (http) runHttp(spark, engine, args)
      else {
        val df = args(1) match {
          case "instant" => engine.instant(args(2), args(3).toLong)
          case "range" =>
            engine.rangeQuery(args(2), args(3).toLong, args(4).toLong, args(5).toLong)
          case other => sys.error(s"unknown mode $other")
        }
        df.orderBy("t").show(50, truncate = false)
        println(s"rows=${df.count()}")
      }
    } finally spark.stop()
  }

  private def runHttp(spark: SparkSession, engine: PromQLEngine,
      args: Array[String]): Unit = {
    val api = new graft.api.HttpApi(spark, engine)
    val port = api.start()
    try {
      def enc(s: String) =
        java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      def sec(ms: String) = (ms.toLong / 1000.0).toString
      val url = args(1) match {
        case "instant" =>
          s"http://127.0.0.1:$port/api/v1/query?query=${enc(args(2))}&time=${sec(args(3))}"
        case "range" =>
          s"http://127.0.0.1:$port/api/v1/query_range?query=${enc(args(2))}" +
            s"&start=${sec(args(3))}&end=${sec(args(4))}&step=${sec(args(5))}"
        case other => sys.error(s"unknown mode $other")
      }
      val conn = new java.net.URI(url).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      println(new String(stream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      println(s"http=$code")
    } finally api.stop()
  }
}

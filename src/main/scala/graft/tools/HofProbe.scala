package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic: print every lambda-bearing higher-order-function line
  * in the formatted plans of the named entries (all entries if none
  * named) — the survey feed for PlanAuditSpec's hofAllowlist. */
object HofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val sites = p.split("\n").filter(_.contains("lambdafunction"))
      if (sites.nonEmpty) {
        println(s"==== $n")
        sites.foreach(l => println("  " + l.trim.take(300)))
      }
    }
    spark.stop()
  }
}

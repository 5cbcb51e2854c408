package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** One-shot plan audit over EVERY driver entry: flags the plan smells
  * the repo's shape rules forbid in volume paths — `SortAggregate`
  * (an immutable aggregation buffer silently demoting a hash
  * aggregate: the min(struct) trap r11 caught in x8/x9/d11),
  * `CartesianProduct`, and `BroadcastNestedLoopJoin`. Prints one line
  * per entry with non-zero counts; exit summary counts flagged
  * entries. Some flags are legitimate where the operator's semantics
  * demand them (e.g. a deliberate small cross join appears as BNLJ
  * only if it lost its broadcast) — the tool surfaces them for
  * adjudication, it does not assert.
  *
  * Since r12 the INVARIANT is gated in `sbt test` by
  * `graft.PlanAuditSpec` (zero SortAggregate / zero CartesianProduct,
  * BNLJ allowlisted per entry); this tool remains for interactive
  * debugging at other scale factors.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val smells = Seq("SortAggregate", "CartesianProduct",
      "BroadcastNestedLoopJoin")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        // distinct operators: the numbered detail section lists each
        // once ("(12) SortAggregate"), reused nodes included
        val hits = smells.map(s =>
          s -> s"\\(\\d+\\) $s".r.findAllIn(p).size).filter(_._2 > 0)
        if (hits.nonEmpty) {
          flagged += 1
          println(f"$name%-28s ${hits.map { case (s, n) => s"$s=$n" }.mkString(" ")}")
        }
      } catch {
        case e: Exception =>
          flagged += 1
          println(f"$name%-28s EXPLAIN FAILED: ${e.getMessage.take(80)}")
      }
    }
    println(s"== ${graft.SparkEntry.queries.size} entries, $flagged flagged ==")
    spark.stop()
  }
}

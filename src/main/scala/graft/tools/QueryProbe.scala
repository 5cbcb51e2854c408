package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone timing probe for a single bench entry: one JVM, one
  * cold draw + six warm draws of the exact [[graft.SparkEntry]]
  * query, with the bench harness's session shape but none of its
  * other queries in the JVM. Exists for adjudicating bench-row
  * drift (SCALE.md "p7_fine_grid drift"): a full Bench run carries
  * 120+ queries of JIT/cache context that a probe strips away, so
  * identical probe distributions across two trees prove a drifted
  * row is measurement context, not plan cost.
  *
  * Usage: runMain graft.tools.QueryProbe [sfDir] [queryName]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "p7_fine_grid"
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    for (i <- 1 to 7) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"probe $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling profile for the PromQL query core (not part of the driver
  * contract): times a battery of representative selector / fold /
  * rate / join / topk queries from [[graft.SparkEntry.queries]]
  * against the given sf directory — run once on the base corpus and
  * once on a `tools/gen_scale.py` k×-series shard set, and compare
  * growth per query family (SCALE.md §1.1). Reports cold plus three
  * warm runs (median), per the bench methodology. */
object ProfilePromql {

  /** Query families × the series-volume axis: scans, instant grids,
    * range folds, rate, joins, heaps, histogram, hires selector. */
  private val battery = Seq(
    "s4_scan", "p2_instant_selector", "p2_hires_selector", "p3_range_count",
    "p7_fine_grid", "f1_rate", "f3_sum_over_time", "a1_sum", "a6_topk",
    "j1_binop_ratio", "j2_group_left", "g13_histogram_quantile",
    "a8_count_values")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-promql")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rows = battery.filter(graft.SparkEntry.queries.contains).map { name =>
      val q = graft.SparkEntry.queries(name)
      val cold = time(q(spark, dir).count())
      val warms = Seq.fill(3)(time(q(spark, dir).count()))
      val med = warms.sorted.apply(1)
      println(f"$name%-24s cold ${cold}%6.2f s   warm-med ${med}%6.2f s")
      (name, med)
    }
    println(rows.map { case (n, m) => f"$n=$m%.2f" }.mkString(" "))
  }
}

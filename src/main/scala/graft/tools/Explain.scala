package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan audit: print the formatted physical plan of a driver-contract
  * query. Usage: runMain graft.tools.Explain <sfDir> <queryName>
  *
  * What to look for (SCALE.md §1): `PushedFilters` / pruned `ReadSchema`
  * on the parquet scans, `ReusedExchange` under repeated subtrees,
  * WholeStageCodegen spans over the hot expressions, and broadcast
  * exchanges on scalar/query sides.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // AQE applies exchange/stage reuse at runtime — the static plan
    // above can show duplicate chains that execute once; the adaptive
    // executed plan below is the ground truth
    df.collect()
    println("==== executed (adaptive) plan ====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

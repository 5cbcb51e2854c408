package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: dump one
  * queries() entry's rows (pinning literal-oracle witnesses).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("s5_read_roundtrip")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir).show(200, truncate = false)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently: c5 recall check
  * at both SFs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val r = graft.SparkEntry.queries("c5_semdedup_apply")(spark, dir)
        .collect().head
      println(s"$dir -> ${r.toSeq}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently (r17): d15
  * positional-prefix candidate volume, old vs new, plus timing.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val threshold = 0.6
    val sets = graft.llm.Dedup.shingleSetsCached(docs, 3, "doc_id", "text")
    val sh = sets.select(col("id"), col("nsh"), explode(col("hs")).as("s"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
    val prefix = ranked
      .where(col("rk") <= (col("nsh") -
        ceil(lit(threshold) * col("nsh") - lit(1e-9)) + 1).cast("int"))
      .select(col("id"), col("nsh"), col("s"), col("rk"))
    val prefix2 = ranked
      .where(col("rk") <= least(col("nsh"), col("nsh") -
        ceil(lit(threshold) * col("nsh") - lit(1e-9)) + 2).cast("int"))
      .select(col("id"), col("nsh"), col("s"))
    val full = ranked.select(col("id"), col("nsh"), col("s"), col("rk"))
    val admit = col("p.s") === col("f.s") && col("p.id") =!= col("f.id") &&
      (col("p.nsh") < col("f.nsh") ||
        (col("p.nsh") === col("f.nsh") && col("p.id") < col("f.id")))
    val posBound = (lit(1L) + least(col("p.nsh") - col("p.rk"),
      col("f.nsh") - col("f.rk"))) >=
      ceil(lit(threshold) * col("p.nsh") - lit(1e-9))

    val candOldRows = prefix.as("p").join(sh.as("f"), admit)
    val candNewRows = prefix.as("p").join(full.as("f"), admit && posBound)

    println("postings rows: " + sh.count())
    println("old candidate JOIN rows: " + candOldRows.count())
    println("new candidate JOIN rows: " + candNewRows.count())
    println("old distinct pairs: " + candOldRows
      .select(least(col("p.id"), col("f.id")).as("ia"),
        greatest(col("p.id"), col("f.id")).as("ib")).distinct().count())
    println("new distinct pairs: " + candNewRows
      .select(least(col("p.id"), col("f.id")).as("ia"),
        greatest(col("p.id"), col("f.id")).as("ib")).distinct().count())
    val candCount = prefix2.as("p").join(sh.as("f"), admit)
      .groupBy(least(col("p.id"), col("f.id")).as("ia"),
        greatest(col("p.id"), col("f.id")).as("ib"))
      .agg(count(lit(1)).as("_mc"), max(col("p.nsh")).as("_pn"))
      .filter(col("_mc") >= least(lit(2L),
        ceil(lit(threshold) * col("_pn") - lit(1e-9)).cast("long")))
      .select(col("ia"), col("ib"))
    println("count-filtered pairs (k=2): " + candCount.count())

    // end-to-end timing of the operator (new code path)
    (1 to 5).foreach { i =>
      val t = time {
        graft.llm.Dedup.containmentPrefixPairs(docs, 3, 0.6).count()
      }
      println(f"containmentPrefixPairs run $i: $t%.3f s")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Bulk plan capture: write every driver entry's STATIC formatted
  * physical plan to `<outDir>/<name>.txt` in one session (r16
  * optimization-round audit artifact — the per-change before/after
  * pairs live beside these as `plans/r16/<name>_{before,after}.txt`,
  * captured with [[Explain]], which also runs the query to print the
  * executed adaptive plan).
  *
  * Usage: runMain graft.tools.ExplainAll <sfDir> <outDir> [name ...]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            plan.getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(s"[explainall] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

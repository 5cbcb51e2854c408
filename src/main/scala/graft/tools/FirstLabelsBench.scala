package graft.tools

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.model.Samples

/** A/B/C bench of the sig-grouped `first(labels)` variants — the r11
  * verdict's open "FirstLabels trade" measurement (SCALE.md
  * "FirstLabels settle", r12). Times the series-index build
  * (`groupBy(sig).agg(first-variant(labels))`, forced through a noop
  * sink so nothing above the aggregate is pruned) over the events
  * samples adapter at each given corpus dir:
  *
  *  - `builtin`   Spark `first(labels)` — map-typed immutable buffer,
  *                silently demotes the whole aggregate to
  *                SortAggregate (the r10 plan; in-partition sort of
  *                the full sample volume)
  *  - `udaf`      the r11 typed `Aggregator` — ObjectHashAggregate,
  *                but the input encoder decodes map<string,string>
  *                into a Scala Map on EVERY input row (one String
  *                alloc per label entry per sample)
  *  - `native`    graft.exec.FirstLabels (r12) — native
  *                TypedImperativeAggregate over raw MapData;
  *                ObjectHashAggregate, child evaluated only while the
  *                group buffer is unset (one MapData.copy per group,
  *                null-check per later row)
  *
  * Usage: runMain graft.tools.FirstLabelsBench <dir> [dir2 ...]
  * One cold + three warm draws per (variant, dir); the samples
  * adapter cache is materialized before any timing so every variant
  * reads the same in-memory scan. */
object FirstLabelsBench {

  private object UdafFirst { // the r11 implementation, kept for the A/B
    case class Buf(set: Boolean, m: Map[String, String])
    private class FirstAgg
        extends Aggregator[Map[String, String], Buf, Map[String, String]] {
      override def zero: Buf = Buf(set = false, null)
      override def reduce(b: Buf, a: Map[String, String]): Buf =
        if (b.set) b else Buf(set = true, a)
      override def merge(a: Buf, b: Buf): Buf = if (a.set) a else b
      override def finish(r: Buf): Map[String, String] = r.m
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Map[String, String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
    def first(labels: Column): Column =
      udaf(new FirstAgg,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
          Map[String, String]]()).apply(labels)
  }

  private def indexOf(samples: DataFrame, variant: String): DataFrame = {
    val f = variant match {
      case "builtin" => first(col("labels"))
      case "udaf" => UdafFirst.first(col("labels"))
      case "native" => graft.exec.FirstLabels.first(col("labels"))
    }
    samples.groupBy(col("sig")).agg(f.as("labels"))
  }

  private def force(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val samples = Samples.fromEventsDir(spark, dir)
      val n = samples.count() // materialize the adapter cache
      println(s"== $dir: $n samples ==")
      for (variant <- Seq("builtin", "udaf", "native")) {
        val df = indexOf(samples, variant)
        val agg = df.queryExecution.executedPlan.toString.linesIterator
          .find(l => l.contains("Aggregate") && l.contains("first"))
          .map(_.trim.takeWhile(_ != '(')).getOrElse("?")
        val draws = (1 to 4).map(_ => force(df))
        println(f"$dir%-28s $variant%-8s plan=$agg%-40s cold=${draws.head}%.2f " +
          f"warm=${draws.tail.map(d => f"$d%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}

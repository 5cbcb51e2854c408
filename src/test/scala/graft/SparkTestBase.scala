package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Build a samples frame from (labels, points). Mirrors the reference
    * test DSL's `load` blocks (promql/test.go): timestamps start at 0. */
  def samplesDF(series: (Map[String, String], Seq[(Long, Double)])*): DataFrame = {
    val rows = series.flatMap { case (labels, pts) =>
      // detect stale markers HERE, while the NaN payload bits are still
      // intact (Spark's UnsafeRow canonicalizes NaN)
      pts.map { case (t, v) => Row(labels, t, v,
        java.lang.Double.doubleToRawLongBits(v) == graft.model.Samples.StaleNaNBits) }
    }
    val schema = StructType(Seq(
      StructField("labels", MapType(StringType, StringType), nullable = false),
      StructField("t", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("stale", BooleanType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  /** `a+dxn` series notation: n+1 points at stepMs apart starting at 0. */
  def seriesAt(stepMs: Long, start: Double, delta: Double, n: Int): Seq[(Long, Double)] =
    (0 to n).map(i => (i * stepMs, start + i * delta))

  /** Collect a (labels,t,v) result into a comparable map. */
  def resultMap(df: DataFrame): Map[(String, Long), Double] =
    df.collect().map { r =>
      val labels = r.getMap[String, String](0).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(",")
      (labels, r.getLong(1)) -> r.getDouble(2)
    }.toMap

  def assertApprox(actual: Map[(String, Long), Double],
      expected: Map[(String, Long), Double], eps: Double = 1e-6): Unit = {
    assert(actual.keySet == expected.keySet,
      s"key mismatch:\n actual=${actual.keySet}\n expected=${expected.keySet}")
    expected.foreach { case (k, e) =>
      val a = actual(k)
      if (e.isNaN) assert(a.isNaN, s"$k: expected NaN, got $a")
      else {
        val tol = math.max(1e-12, math.abs(e) * eps)
        assert(math.abs(a - e) <= tol, s"$k: expected $e, got $a")
      }
    }
  }
}

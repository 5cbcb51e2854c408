package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The DIV-comparison rewrite must be exactly semantics-preserving at
  * the truncation boundaries, including negative dividends. */
class IntDivPushdownSpec extends SparkTestBase {

  test("rewritten comparisons match brute evaluation at boundaries") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(IntDivPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntDivPushdown
    val d = 1000L
    // values straddling multiples of d, plus negatives and zero
    val vals = Seq(-2001L, -2000L, -1999L, -1L, 0L, 1L, 999L, 1000L,
      1001L, 4999L, 5000L, 5001L)
    val df = vals.toDF("a")
    // brute truth via scala semantics of truncating division
    def brute(p: Long => Boolean): Set[Long] = vals.filter(p).toSet
    def q(cond: String): Set[Long] =
      df.filter(expr(cond)).collect().map(_.getLong(0)).toSet
    assert(q(s"a DIV $d >= 2") == brute(a => a / d >= 2))
    assert(q(s"a DIV $d > 2") == brute(a => a / d > 2))
    assert(q(s"a DIV $d <= 4") == brute(a => a / d <= 4))
    assert(q(s"a DIV $d < 4") == brute(a => a / d < 4))
    assert(q(s"a DIV $d <= 0") == brute(a => a / d <= 0))
    assert(q(s"a DIV $d > 0") == brute(a => a / d > 0))
    // negative thresholds are deliberately NOT rewritten; still correct
    assert(q(s"a DIV $d >= -2") == brute(a => a / d >= -2))
    assert(q(s"a DIV $d < -1") == brute(a => a / d < -1))
  }

  test("NTZ unix_millis rewrite is exact at micros boundaries and pushes to parquet") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(IntDivPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntDivPushdown
    val X = 1704153600000L // threshold, epoch ms
    // micros straddling every truncation boundary of the threshold and
    // one step around it
    val micros = Seq(X * 1000 - 1000, X * 1000 - 1, X * 1000,
      X * 1000 + 999, X * 1000 + 1000, X * 1000 + 1999, X * 1000 + 2000)
    def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
      us / 1000000, ((us % 1000000) * 1000).toInt, java.time.ZoneOffset.UTC)
    val dir = java.nio.file.Files.createTempDirectory("ntz").toString
    micros.map(ldt).toDF("ts").write.mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir)
    assert(read.schema("ts").dataType == TimestampNTZType,
      s"fixture must round-trip as NTZ, got ${read.schema("ts").dataType}")
    val df = read.withColumn("t",
      unix_millis(col("ts").cast(TimestampType)))
    def q(c: org.apache.spark.sql.Column): Set[Long] =
      df.filter(c).select(col("t")).collect().map(_.getLong(0)).toSet
    def brute(p: Long => Boolean): Set[Long] =
      micros.map(_ / 1000).filter(p).toSet
    assert(q(col("t") >= X) == brute(_ >= X))
    assert(q(col("t") > X) == brute(_ > X))
    assert(q(col("t") <= X) == brute(_ <= X))
    assert(q(col("t") < X) == brute(_ < X))
    assert(q(col("t") >= X && col("t") < X + 2) == brute(t => t >= X && t < X + 2))
    // and the bound must actually reach the parquet scan as a raw ts
    // predicate — otherwise the rewrite silently stopped firing
    val plan = df.filter(col("t") >= X)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"expected a pushed ts bound:\n${plan.take(1500)}")
  }
}

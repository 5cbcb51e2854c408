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
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Rewrite comparisons over exact integral division into direct bounds
  * on the dividend so they can reach the data source.
  *
  * The sample adapter derives `t = ts DIV 1_000_000` (epoch-nanos →
  * ms; `DIV` because nanos overflow double's mantissa). Catalyst
  * cannot push `t >= X` through the division, so every time-bounded
  * query scans all row groups. Truncating division is monotone, which
  * makes the bounds exactly invertible for the nonnegative constants
  * that timestamps produce:
  *
  *   a DIV d >= x  ⟺  a >= x·d            (x > 0; false ⇒ false for a<0)
  *   a DIV d >  x  ⟺  a >= (x+1)·d        (x ≥ 0)
  *   a DIV d <= x  ⟺  a <  (x+1)·d        (x ≥ 0; a<0 satisfies both)
  *   a DIV d <  x  ⟺  a <  x·d            (x > 0)
  *
  * After the rewrite the predicate is a plain comparison on the column,
  * which the parquet reader turns into row-group min/max pruning — at
  * 100 TB the difference between scanning a day and scanning the table.
  * Installed idempotently by PromQLEngine via
  * `spark.experimental.extraOptimizations`.
  */
object IntDivPushdown extends Rule[LogicalPlan] {

  private def mulExact(x: Long, d: Long): Option[Long] =
    try Some(Math.multiplyExact(x, d)) catch { case _: ArithmeticException => None }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ GreaterThanOrEqual(div: IntegralDivide, Literal(x: Long, LongType)) =>
        rewrite(div, x, strict = false, lower = true).getOrElse(e)
      case e @ GreaterThan(div: IntegralDivide, Literal(x: Long, LongType)) =>
        rewrite(div, x, strict = true, lower = true).getOrElse(e)
      case e @ LessThanOrEqual(div: IntegralDivide, Literal(x: Long, LongType)) =>
        rewrite(div, x, strict = false, lower = false).getOrElse(e)
      case e @ LessThan(div: IntegralDivide, Literal(x: Long, LongType)) =>
        rewrite(div, x, strict = true, lower = false).getOrElse(e)
    }

  private def rewrite(div: IntegralDivide, x: Long, strict: Boolean,
      lower: Boolean): Option[Expression] = div.right match {
    case Literal(d: Long, LongType) if d > 0 =>
      val a = div.left
      (lower, strict) match {
        case (true, false) if x > 0 => // a DIV d >= x ⟺ a >= x·d
          mulExact(x, d).map(b => GreaterThanOrEqual(a, Literal(b, LongType)))
        case (true, true) if x >= 0 => // a DIV d > x ⟺ a >= (x+1)·d
          mulExact(x + 1, d).map(b => GreaterThanOrEqual(a, Literal(b, LongType)))
        case (false, false) if x >= 0 => // a DIV d <= x ⟺ a < (x+1)·d
          mulExact(x + 1, d).map(b => LessThan(a, Literal(b, LongType)))
        case (false, true) if x > 0 => // a DIV d < x ⟺ a < x·d
          mulExact(x, d).map(b => LessThan(a, Literal(b, LongType)))
        case _ => None
      }
    case _ => None
  }
}

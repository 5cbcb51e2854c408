package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Rewrite comparisons over exact epoch-millis derivations into direct
  * bounds on the underlying column so they can reach the data source.
  *
  * The sample adapter derives `t` (epoch ms) from the parquet `ts`
  * column, whose physical encoding varies with the generator's pyarrow
  * version:
  *
  *   - TIMESTAMP(NANOS) read as LongType nanos → `t = ts DIV 1_000_000`
  *   - TIMESTAMP_NTZ (naive micros, session tz pinned UTC) →
  *     `t = unix_millis(cast(ts as timestamp))`
  *   - zoned TIMESTAMP → `t = unix_millis(ts)`
  *
  * Catalyst cannot push `t >= X` through either derivation, so every
  * time-bounded query would scan all row groups. Both derivations are
  * truncating division by a positive constant (nanos DIV 1e6, micros
  * DIV 1e3), which is monotone and exactly invertible for the
  * nonnegative constants that timestamps produce:
  *
  *   a DIV d >= x  ⟺  a >= x·d            (x > 0; false ⇒ false for a<0)
  *   a DIV d >  x  ⟺  a >= (x+1)·d        (x ≥ 0)
  *   a DIV d <= x  ⟺  a <  (x+1)·d        (x ≥ 0; a<0 satisfies both)
  *   a DIV d <  x  ⟺  a <  x·d            (x > 0)
  *
  * After the rewrite the predicate is a plain comparison on the column
  * (long or timestamp literal), which the parquet reader turns into
  * row-group min/max pruning — at 100 TB the difference between
  * scanning a day and scanning the table.
  * Installed idempotently by PromQLEngine via
  * `spark.experimental.extraOptimizations`.
  */
object IntDivPushdown extends Rule[LogicalPlan] {

  private def mulExact(x: Long, d: Long): Option[Long] =
    try Some(Math.multiplyExact(x, d)) catch { case _: ArithmeticException => None }

  /** A derivation `a DIV d` of epoch millis from a scan column `a`:
    * either a literal IntegralDivide over a long column, or unix_millis
    * over a (possibly NTZ-cast) timestamp column, which truncates micros
    * by 1000 (`TimeUnit.MICROSECONDS.toMillis` — toward-zero truncation,
    * equal to floor for the positive epochs this engine queries). The
    * rewritten bound literal is typed `litType` so it compares against
    * the raw column and can be pushed to parquet. */
  private object MillisDerivation {
    def unapply(e: Expression): Option[(Expression, Long, DataType)] = e match {
      case div: IntegralDivide => div.right match {
        case Literal(d: Long, LongType) if d > 0 => Some((div.left, d, LongType))
        case _ => None
      }
      case UnixMillis(c: Cast)
          if c.child.dataType == TimestampNTZType && c.dataType == TimestampType =>
        Some((c.child, 1000L, TimestampNTZType))
      case UnixMillis(a) if a.dataType == TimestampType =>
        Some((a, 1000L, TimestampType))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ GreaterThanOrEqual(MillisDerivation(a, d, dt), Literal(x: Long, LongType)) =>
        rewrite(a, d, dt, x, strict = false, lower = true).getOrElse(e)
      case e @ GreaterThan(MillisDerivation(a, d, dt), Literal(x: Long, LongType)) =>
        rewrite(a, d, dt, x, strict = true, lower = true).getOrElse(e)
      case e @ LessThanOrEqual(MillisDerivation(a, d, dt), Literal(x: Long, LongType)) =>
        rewrite(a, d, dt, x, strict = false, lower = false).getOrElse(e)
      case e @ LessThan(MillisDerivation(a, d, dt), Literal(x: Long, LongType)) =>
        rewrite(a, d, dt, x, strict = true, lower = false).getOrElse(e)
    }

  private def rewrite(a: Expression, d: Long, litType: DataType, x: Long,
      strict: Boolean, lower: Boolean): Option[Expression] =
    (lower, strict) match {
      case (true, false) if x > 0 => // a DIV d >= x ⟺ a >= x·d
        mulExact(x, d).map(b => GreaterThanOrEqual(a, Literal(b, litType)))
      case (true, true) if x >= 0 => // a DIV d > x ⟺ a >= (x+1)·d
        mulExact(x + 1, d).map(b => GreaterThanOrEqual(a, Literal(b, litType)))
      case (false, false) if x >= 0 => // a DIV d <= x ⟺ a < (x+1)·d
        mulExact(x + 1, d).map(b => LessThan(a, Literal(b, litType)))
      case (false, true) if x > 0 => // a DIV d < x ⟺ a < x·d
        mulExact(x, d).map(b => LessThan(a, Literal(b, litType)))
      case _ => None
    }
}

package graft.exec

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact PromQL aggregation quantile (`promql/quantile.go:161-183`),
  * as a partial+merge hash aggregate.
  *
  * Spark's builtin `percentile` buffers the same per-group value set
  * but sorts with Spark's double ordering — NaN LAST — where the
  * vintage heap sorts NaN FIRST (`vectorByValueHeap.Less`,
  * functions.go:1257-1262), so any group containing a NaN sample
  * diverges: in the reference a NaN occupies the low ranks (low φ →
  * NaN, high φ → unaffected). This Aggregator buffers the values and
  * finishes with [[PromUdfs.quantile]], the shared NaN-first
  * interpolation also used by `quantile_over_time`. Memory is
  * O(group size) per group exactly like `percentile`; the buffer
  * merges associatively so map-side partials still apply.
  */
object PromQuantile {
  class QuantileAgg(q: Double)
      extends Aggregator[Double, Seq[Double], Double] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], a: Double): Seq[Double] = b :+ a
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = a ++ b
    override def finish(r: Seq[Double]): Double =
      PromUdfs.quantile(q, r.toArray)
    override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def quantile(q: Double)(v: Column): Column =
    udaf(new QuantileAgg(q), Encoders.scalaDouble).apply(v)
}

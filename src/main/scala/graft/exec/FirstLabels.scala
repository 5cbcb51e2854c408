package graft.exec

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Hash-aggregable `first(labels)` for the sig-grouped "labels ride
  * along" pattern: every row of a sig group carries the identical
  * canonical label content (sig = xxhash64 of the canonical string),
  * so ANY representative is correct — but Spark's builtin `first` over
  * a map type has an immutable aggregation buffer and silently demotes
  * the whole sample-volume aggregate to `SortAggregate` (the same
  * r11 trap as min(struct); caught by `tools/PlanAudit` on s13). As a
  * typed Aggregator the plan uses `ObjectHashAggregate` — hash-based
  * with sort fallback only under memory pressure — and the buffer is
  * one labels map per group per task, exactly what `first` shipped. */
object FirstLabels {
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

package graft.exec

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Hash-aggregable argmin: the (tie, payload) of the row with the
  * smallest key, ties broken on the tie string — the nearest-centroid
  * argmax shape (`key = −cosine`, `tie = cluster label`,
  * `payload = cosine`).
  *
  * Replaces `min(struct(key, tie, payload))` (r11): a struct-typed
  * min has an IMMUTABLE aggregation buffer, which silently demotes
  * the corpus-volume aggregate to `SortAggregate` — an in-partition
  * sort of corpus×k scored rows per assign pass. As a typed
  * `Aggregator` the plan uses `ObjectHashAggregate` (hash-based, with
  * sort fallback only under memory pressure), keeping the repo's
  * volume-aggregations-are-hash-based rule; shuffle volume is
  * unchanged (one partial buffer per group per task either way).
  *
  * Ordering contract — identical to the struct min the oracles mirror:
  * smaller key wins, equal keys fall to the smaller NUMERIC tie (the
  * cluster labels are numeric; callers cast the winner back to the
  * label column's own type), and a NaN key ALWAYS loses (struct-min
  * orders NaN largest); a group whose every key is NaN yields the
  * first row seen — the degenerate-embedding case the callers pre-pin
  * with `nanvl`.
  */
object ArgMin {
  case class In(key: Double, tie: Double, payload: Double)
  case class Buf(key: Double, tie: Double, payload: Double, set: Boolean)
  case class Out(tie: Double, payload: Double)

  private class ArgMinAgg extends Aggregator[In, Buf, Out] {
    private def better(k: Double, t: Double, b: Buf): Boolean = {
      if (java.lang.Double.isNaN(k)) return false
      if (!b.set || java.lang.Double.isNaN(b.key)) return true
      if (k != b.key) k < b.key else t < b.tie
    }
    override def zero: Buf = Buf(Double.NaN, Double.NaN, Double.NaN, set = false)
    override def reduce(b: Buf, a: In): Buf =
      if (better(a.key, a.tie, b)) Buf(a.key, a.tie, a.payload, set = true)
      else if (!b.set) Buf(a.key, a.tie, a.payload, set = true) // first NaN row
      else b
    override def merge(a: Buf, b: Buf): Buf =
      if (!b.set) a
      else if (better(b.key, b.tie, a)) b
      else if (!a.set) b
      else a
    override def finish(r: Buf): Out = Out(r.tie, r.payload)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** `argmin(key, tie, payload)` → struct(tie = winning tie,
    * payload = winning payload). */
  def argmin(key: Column, tie: Column, payload: Column): Column =
    udaf(new ArgMinAgg, Encoders.product[In]).apply(key, tie, payload)
}

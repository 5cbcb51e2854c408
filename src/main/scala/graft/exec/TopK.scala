package graft.exec

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-heap top-k/bottom-k aggregation for PromQL `topk`/`bottomk`.
  *
  * The reference keeps a per-group bounded heap of size k
  * (`promql/engine.go:1364-1384`). A `row_number` window formulation puts
  * EVERY row of a group into one partition — for ungrouped `topk(k, v)`
  * that is a single partition per step, a scale-killer. This Aggregator
  * instead runs as a partial+merge hash aggregate: each map task keeps at
  * most 2k rows per group, merge concatenates and trims, so memory and
  * shuffle volume are O(k · groups), never O(rows).
  *
  * Rows carry the full payload (canonical label string, sample timestamp,
  * value) so no second pass / self-join is needed: the winner rows are
  * exploded straight back into the vector frame (labels are decoded from
  * the length-prefixed canonical string, see [[Samples.sigStr]]).
  *
  * `key` is the sort key with NaN already mapped to ∓Inf (NaN always
  * loses, engine.go:1346-1353); `tie` breaks exact value ties by the
  * canonical label string so results are deterministic.
  */
object TopK {
  case class Entry(key: Double, tie: String, st: Long, v: Double)

  class TopKAgg(k: Int, desc: Boolean)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    // "better" ordering: winners first
    private def better(a: Entry, b: Entry): Boolean =
      if (a.key != b.key) { if (desc) a.key > b.key else a.key < b.key }
      else a.tie < b.tie

    private def trim(b: Seq[Entry]): Seq[Entry] =
      if (b.lengthCompare(k) <= 0) b else b.sortWith(better).take(k)

    override def zero: Seq[Entry] = Vector.empty
    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] = {
      val appended = b :+ a
      // trim lazily at 2k to amortize the sort
      if (appended.lengthCompare(2 * k) >= 0) trim(appended) else appended
    }
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = trim(a ++ b)
    // ALWAYS sorted, not just when trimming: the reference emits each
    // group's winners in order (engine.go:1388-1407 sorts the reversed
    // heap before appending) — topk descending, bottomk ascending, NaN
    // last in both (the key pre-maps NaN to the losing infinity)
    override def finish(r: Seq[Entry]): Seq[Entry] = r.sortWith(better).take(k)
    override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  def topk(k: Int, desc: Boolean)(key: Column, tie: Column, st: Column,
      v: Column): Column =
    udaf(new TopKAgg(k, desc), Encoders.product[Entry])
      .apply(key, tie, st, v)

  /** Decode the length-prefixed canonical label string back to a map
    * (inverse of [[graft.model.Samples.sigStr]]). */
  def decodeLabels(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    val n = s.length
    while (i < n) {
      var j = s.indexOf(':', i)
      val klen = s.substring(i, j).toInt
      val key = s.substring(j + 1, j + 1 + klen)
      i = j + 1 + klen + 1 // skip '='
      j = s.indexOf(':', i)
      val vlen = s.substring(i, j).toInt
      val value = s.substring(j + 1, j + 1 + vlen)
      i = j + 1 + vlen
      if (i < n) i += 1 // skip ';'
      out += key -> value
    }
    out.result()
  }

  val decodeLabelsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) => decodeLabels(s))
}

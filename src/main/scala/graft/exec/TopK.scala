package graft.exec

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  def topk(k: Int, desc: Boolean)(key: Column, tie: Column, st: Column,
      v: Column): Column =
    GraftColumnBridge.column(TopKExpr(k, desc,
      GraftColumnBridge.expression(key), GraftColumnBridge.expression(tie),
      GraftColumnBridge.expression(st), GraftColumnBridge.expression(v))
      .toAggregateExpression())

  /** Buffer entry of the native aggregate: the tie travels as a
    * DEFENSIVELY-COPIED UTF8String (the input row's memory is reused
    * across rows). */
  final case class Ent(key: Double, tie: UTF8String, st: Long, v: Double)

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

/** Native bounded-heap aggregate (r12): the r11 typed-`Aggregator`
  * form paid a per-INPUT-ROW encoder decode of the 4-field
  * (double, string, long, double) entry — the FirstLabels lesson
  * applied to the topk path (a6 read 2× the identical-selector a1).
  * As a [[TypedImperativeAggregate]] the update reads the child
  * expressions straight off the input row; only the appended entry
  * allocates (one UTF8String clone). Semantics identical to the udaf:
  * map-side trim at 2k, merge-trim to k, finish sorted winners-first
  * (topk descending, bottomk ascending; exact-value ties break on the
  * canonical label string in BINARY order — DuckDB's default string
  * collation, which is what the oracles compare with; the reference
  * itself leaves equal-value order heap-nondeterministic,
  * engine.go:1388-1407). */
case class TopKExpr(k: Int, desc: Boolean, key: Expression,
    tie: Expression, st: Expression, v: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      scala.collection.mutable.ArrayBuffer[TopK.Ent]] {

  override def prettyName: String = if (desc) "topk_heap" else "bottomk_heap"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType, nullable = false),
    StructField("tie", StringType, nullable = false),
    StructField("st", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def children: Seq[Expression] = Seq(key, tie, st, v)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKExpr =
    copy(key = newChildren(0), tie = newChildren(1), st = newChildren(2),
      v = newChildren(3))

  private type Buf = scala.collection.mutable.ArrayBuffer[TopK.Ent]

  // "better" ordering: winners first
  private def better(a: TopK.Ent, b: TopK.Ent): Boolean =
    if (a.key != b.key) { if (desc) a.key > b.key else a.key < b.key }
    else a.tie.compareTo(b.tie) < 0

  private def trim(b: Buf): Buf =
    if (b.length > k) b.sortWith(better).take(k) else b

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(b: Buf, input: InternalRow): Buf = {
    val kd = key.eval(input)
    val td = tie.eval(input)
    val sd = st.eval(input)
    val vd = v.eval(input)
    // skip the row if ANY child is null — a null st/v would otherwise
    // silently unbox to 0, fabricating a timestamp/value
    if (kd == null || td == null || sd == null || vd == null) return b
    b += TopK.Ent(kd.asInstanceOf[Double],
      td.asInstanceOf[UTF8String].clone(),
      sd.asInstanceOf[Long], vd.asInstanceOf[Double])
    // trim lazily at 2k to amortize the sort
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(a: Buf, b: Buf): Buf = trim(a ++= b)

  // ALWAYS sorted, not just when trimming: the reference emits each
  // group's winners in order — topk descending, bottomk ascending,
  // NaN last in both (the key pre-maps NaN to the losing infinity)
  override def eval(b: Buf): Any = {
    val winners = b.sortWith(better).take(k)
    new GenericArrayData(winners.map(e =>
      InternalRow(e.key, e.tie, e.st, e.v)).toArray[Any])
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach { e =>
      out.writeDouble(e.key)
      val tb = e.tie.getBytes
      out.writeInt(tb.length)
      out.write(tb)
      out.writeLong(e.st)
      out.writeDouble(e.v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buf(n)
    var i = 0
    while (i < n) {
      val kd = in.readDouble()
      val tl = in.readInt()
      val tb = new Array[Byte](tl)
      in.readFully(tb)
      b += TopK.Ent(kd, UTF8String.fromBytes(tb), in.readLong(),
        in.readDouble())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKExpr =
    copy(inputAggBufferOffset = newOffset)
}

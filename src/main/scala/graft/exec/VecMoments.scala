package graft.exec

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass corpus VECTOR MOMENTS over a raw `array<float>` column:
  * the dim(dim+1)/2 upper-triangular Σvᵢvⱼ gramian, the per-dimension
  * sums Σvᵢ, and the row count, in a single flat `Array[Double]`
  * buffer `[tri | sums | n]` — everything PCA / whitening / covariance
  * needs from the cluster in ONE ObjectHashAggregate
  * (RowMatrix.computeGramianMatrix's shape: the eigen problem that
  * follows is a driver-side dim×dim matrix).
  *
  * r13, closing the r12 verdict watch item: the typed-`Aggregator`
  * predecessors (GramianAgg/MomentsAgg) paid a per-INPUT-ROW encoder
  * decode of the `Seq[Float]` vector plus a Kryo buffer codec — the
  * exact per-row boxing class the FirstLabels/ArrayProject work
  * eliminated elsewhere. As a [[TypedImperativeAggregate]] the update
  * reads floats straight off the UnsafeArrayData and the buffer
  * serializes as raw doubles. Semantics identical: products accumulate
  * in double from float32 inputs (order-of-addition noise ~1e-15
  * relative vanishes below float32's ULP when the caller casts the
  * emitted cells back to float), wrong-length or null-element vectors
  * are skipped rather than corrupting the triangle.
  *
  * Scale shape: each map task reduces its rows into one
  * (t + dim + 1)-double buffer; the shuffle is one buffer per task
  * regardless of corpus size. */
case class VecMomentsExpr(dim: Int, child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  private val t = dim * (dim + 1) / 2
  private val len = t + dim + 1

  override def prettyName: String = "vec_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMomentsExpr =
    copy(child = newChildren(0))

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val raw = child.eval(input)
    if (raw == null) return b
    val v = raw.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return b
    val a = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return b // null element: skip the whole row
      a(i) = v.getFloat(i).toDouble
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      val vi = a(i)
      var j = i
      while (j < dim) { b(k) += vi * a(j); j += 1; k += 1 }
      b(t + i) += vi
      i += 1
    }
    b(t + dim) += 1.0
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { x(i) += y(i); i += 1 }
    x
  }

  override def eval(b: Array[Double]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](len * 8)
    val bb = java.nio.ByteBuffer.wrap(out)
    var i = 0
    while (i < len) { bb.putDouble(b(i)); i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new Array[Double](len)
    var i = 0
    while (i < len) { b(i) = bb.getDouble(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsExpr =
    copy(inputAggBufferOffset = newOffset)
}

object VecMoments {
  /** Flat `[tri(t) | sums(dim) | n]` moments of an `array<float>`
    * column (t = dim(dim+1)/2). */
  def moments(dim: Int, v: Column): Column =
    GraftColumnBridge.column(VecMomentsExpr(dim,
      GraftColumnBridge.expression(v)).toAggregateExpression())

  /** Decode helper for the flat buffer: (n, sums, tri). */
  def split(dim: Int, m: Array[Double]): (Long, Array[Double], Array[Double]) = {
    val t = dim * (dim + 1) / 2
    (m(t + dim).toLong, m.slice(t, t + dim), m.take(t))
  }
}

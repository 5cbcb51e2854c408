package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

import graft.model.Samples
import graft.storage.GorillaChunk

/** Native chunk-decode generator: one Gorilla/XOR blob →
  * (t, v, stale) rows, emitted as `InternalRow`s straight into the
  * `Generate` node.
  *
  * This replaces a Scala UDF returning `Seq[case class]` on the chunk
  * read path: the UDF materializes every point as a boxed object and
  * pays a reflective Catalyst conversion per point before `explode`
  * even sees it; the generator decodes once and streams unboxed rows
  * (the stale flag derives from the raw bits inline — the marker's
  * signalling-NaN payload never surfaces as a double where Spark
  * could canonicalize it). `CodegenFallback` is no loss here:
  * `explode(udf(...))` never enters whole-stage codegen either, and
  * generators dominate their cost in row production, not dispatch.
  */
case class ChunkDecode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chunk_decode expects a binary column, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("stale", BooleanType, nullable = false)))

  override def prettyName: String = "chunk_decode"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val blob = child.eval(input)
    if (blob == null) Iterator.empty
    else {
      val (ts, vb) = GorillaChunk.decode(blob.asInstanceOf[Array[Byte]])
      new Iterator[InternalRow] {
        private var i = 0
        def hasNext: Boolean = i < ts.length
        def next(): InternalRow = {
          val bits = vb(i)
          val r = new GenericInternalRow(3)
          r.setLong(0, ts(i))
          r.setDouble(1, java.lang.Double.longBitsToDouble(bits))
          r.setBoolean(2, bits == Samples.StaleNaNBits)
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkDecode =
    copy(child = newChild)
}

object ChunkDecode {
  /** Column-API entry point: select alongside pass-through columns;
    * the analyzer extracts the generator into a `Generate` node whose
    * output columns are `t`, `v`, `stale`. */
  def decode(chunk: Column): Column =
    GraftColumnBridge.column(ChunkDecode(GraftColumnBridge.expression(chunk)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle expression: the k-token windows of a
  * single-space-tokenized string, as `array<string>` — optionally
  * distinct (first-occurrence order, the Jaccard set form) or every
  * window in position order (the substring-dedup form).
  *
  * This replaces a Scala UDF on the hottest text path (d2/d3 shingle
  * sets, d10/d11 substring windows, t7 contamination): a UDF
  * round-trips UTF8String -> java.lang.String -> UTF8String per row
  * and drops out of whole-stage codegen; this expression stays inside
  * the generated plan (doGenCode emits a static call) and never
  * decodes bytes at all. Tokenization matches `split(text, " ", -1)`:
  * single-byte 0x20 separators (UTF-8 guarantees 0x20 never occurs
  * inside a multi-byte sequence), empties preserved. Because tokens
  * are joined by the SAME single spaces they were split on, each
  * window is a byte-range VIEW of one shared byte copy of the input —
  * no per-window concatenation.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  // input is always the string text column (call sites are internal;
  // a non-string child would fail analysis via the cast-free eval)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.build(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.build($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Column-API entry points (ExpressionUtils bridges Spark 4's
    * ColumnNode layer). */
  def shingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(text), n, distinct = true))
  def windows(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(text), n, distinct = false))

  /** Shared by interpreted eval and generated code. */
  def build(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes // one copy; every window is a view into it
    val len = bytes.length
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    if (tokens < n) return Empty
    // starts(t) = byte offset of token t; sentinel start past the end
    // makes window length = starts(w + n) - 1 - starts(w) uniform
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(tokens) = len + 1
    val m = tokens - n + 1
    if (!distinct) {
      val out = new Array[Any](m)
      var w = 0
      while (w < m) {
        out(w) = UTF8String.fromBytes(bytes, starts(w),
          starts(w + n) - 1 - starts(w))
        w += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]
      var w = 0
      while (w < m) {
        seen.add(UTF8String.fromBytes(bytes, starts(w),
          starts(w + n) - 1 - starts(w)))
        w += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }
}

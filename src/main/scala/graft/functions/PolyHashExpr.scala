package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling polynomial fingerprint `fold(acc·31 + code) mod P`
  * over a string's character stream (code points, matching what
  * `ascii(substring(text, i, 1))` yields per position) — the t4
  * document fingerprint ([[graft.llm.TextOps.fingerprint]]).
  *
  * Replaces the HOF pipeline
  * `aggregate(transform(sequence(1, length(text)), i ->
  * ascii(substring(text, i, 1))), ...)`, which was doubly bad at
  * corpus volume: the lambdas evaluate INTERPRETED per character, and
  * each `substring(text, i, 1)` seeks from the string start — O(n²)
  * per document. Here the fold is one pass over the UTF-8 bytes
  * (O(n), zero allocation) inside whole-stage codegen.
  *
  * Equivalence contract (r13 advice): bit-identical to the HOF form
  * ONLY on single-byte (ASCII) characters — the stated fixture
  * contract, and what every oracle corpus contains. On multi-byte
  * input this expression folds the FULL code point (matching DuckDB's
  * `ord()`), whereas Spark's `ascii()` yields just the first UTF-8
  * byte's value — so fingerprints persisted by the pre-r13 HOF
  * pipeline differ on non-ASCII text and would need re-deriving. The
  * modulus P < 1e15 keeps acc·31 + c within signed-64 in both forms. */
case class StringPolyHash(child: Expression, mod: Long)
    extends UnaryExpression {
  require(mod > 0, "string_poly_hash needs a positive modulus")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"string_poly_hash expects a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "string_poly_hash"

  override def nullSafeEval(input: Any): Any =
    StringPolyHash.hash(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringPolyHash.hash($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)
}

object StringPolyHash {
  def apply(text: Column, mod: Long): Column =
    GraftColumnBridge.column(StringPolyHash(
      GraftColumnBridge.expression(text), mod))

  /** One pass over the UTF-8 bytes, decoding code points in place —
    * shared by interpreted eval and generated code. */
  def hash(s: UTF8String, mod: Long): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < n) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < n) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        i += 3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < n) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        i += 4
      } else { cp = b0; i += 1 } // malformed byte: degrade like charAt
      acc = (acc * 31 + cp) % mod
    }
    acc
  }
}

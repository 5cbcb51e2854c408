package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-profile stopword hit counter: for a list of stopword
  * profiles, the per-profile count of tokens (single-space split of
  * the LOWERCASED text, empties preserved) that appear in that
  * profile's word list — returned as one `array<int>` in profile
  * order, computed in a single pass over the text bytes.
  *
  * This replaces the higher-order-function form
  * `size(filter(split(lower(text), " "), t -> array_contains(stops, t)))`
  * evaluated once per profile: lambda functions run INTERPRETED (no
  * codegen), and the language-ID argmax chain evaluated the 5-profile
  * battery twice per fold step — the dominant cost of every langId
  * consumer (t3/t15/t26/t27/c3; t27's whole bench row was this). Here
  * each token is hashed once against a merged token→profile-bitmask
  * map, the expression stays inside whole-stage codegen (`doGenCode`
  * emits a call on a reference object), and text bytes are never
  * copied (tokens are UTF8String views; only candidate tokens that
  * could possibly match — byte length within the lowercase-shrink
  * bound — are lowercased).
  *
  * Tokenization matches `split(lower(text), " ", -1)`: Unicode
  * lowercasing never produces, removes, or reorders U+0020, so
  * splitting the raw bytes on 0x20 (which UTF-8 guarantees never
  * occurs inside a multi-byte sequence) and lowercasing per token is
  * byte-identical to lowercasing the whole text first.
  */
case class StopwordHits(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {
  require(profiles.nonEmpty, "stopword_hits needs at least one profile")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_hits expects a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_hits"

  @transient private lazy val matcher = new StopwordMatcher(profiles)

  override def nullSafeEval(input: Any): Any =
    matcher.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordMatcher", matcher,
      classOf[StopwordMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  /** Column-API entry point. */
  def hits(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      StopwordHits(GraftColumnBridge.expression(text), profiles))
}

/** The shared matcher: token → bitmask of profile indices. Built once
  * per expression instance (lazily, on each executor after plan
  * deserialization — only `profiles` is serialized). */
final class StopwordMatcher(profiles: Seq[Seq[String]]) extends Serializable {
  private val nProfiles = profiles.size

  // (token -> profile bitmask, max stopword byte length)
  @transient private lazy val state: (java.util.HashMap[UTF8String, Integer], Int) = {
    val m = new java.util.HashMap[UTF8String, Integer]
    var maxB = 0
    profiles.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val u = UTF8String.fromString(w)
        if (u.numBytes > maxB) maxB = u.numBytes
        val prev = m.get(u)
        m.put(u, Integer.valueOf((if (prev == null) 0 else prev.intValue) | (1 << i)))
      }
    }
    (m, maxB)
  }

  /** Single pass: split on 0x20, lowercase only length-plausible
    * tokens, accumulate per-profile counts via the bitmask. */
  def hits(s: UTF8String): ArrayData = {
    val (map, maxBytes) = state
    // Unicode lowercasing shrinks a char at most 3 bytes -> 1 (e.g.
    // U+212A KELVIN SIGN -> 'k'), so tokens longer than 3x the longest
    // stopword can never lowercase into a match.
    val maxRaw = maxBytes * 3
    val counts = new Array[Int](nProfiles)
    val bytes = s.getBytes
    val len = bytes.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        val tl = i - start
        if (tl > 0 && tl <= maxRaw) {
          val low = UTF8String.fromBytes(bytes, start, tl).toLowerCase
          if (low.numBytes <= maxBytes) {
            val mask = map.get(low)
            if (mask != null) {
              var mm = mask.intValue
              while (mm != 0) {
                counts(java.lang.Integer.numberOfTrailingZeros(mm)) += 1
                mm &= mm - 1
              }
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

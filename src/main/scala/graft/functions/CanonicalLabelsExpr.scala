package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, MapType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native canonical label string — the length-prefixed
  * `len:key=len:value;…` encoding (key-sorted) that signatures hash
  * (`labels.go:85-96` of the reference hashes its own canonical byte
  * form the same way). Replaces the
  * `array_join(transform(array_sort(map_entries(...))))` pipeline: a
  * lambda-bearing HOF chain evaluates INTERPRETED per entry (the
  * SCALE.md §3 ArrayDot lesson), and this string is built per ROW in
  * the hottest paths — the ingest dedup's sig, every at-query-time
  * `sigOn`/`sigWithout` for binop matching, and the topk tie key. As
  * a codegen expression the per-row cost is one insertion sort over
  * the handful of entries plus one StringBuilder pass.
  *
  * Exact-output contract with the HOF form it replaces (oracle
  * strings and every persisted sig depend on it): entries sort by
  * KEY in UTF8String binary order (what `array_sort` on the entry
  * structs used), length prefixes count CHARACTERS (what `length()`
  * returned), and a null VALUE drops its entry with no separator
  * residue (what `concat(...)=null` + `array_join` skipping nulls
  * did). Pinned against the HOF expression by property test. */
case class CanonicalLabels(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_labels"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    // the empty-labels literal `map()` types as map<null,null> (its
    // MapData is always empty, so no element is ever read)
    case MapType(kt, vt, _)
        if (kt == StringType || kt == NullType) &&
          (vt == StringType || vt == NullType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonical_labels expects map<string,string>, got $other")
  }

  override def nullSafeEval(m: Any): Any =
    CanonicalLabels.canon(m.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m => s"graft.functions.CanonicalLabels.canon($m)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalLabels =
    copy(child = newChild)
}

object CanonicalLabels {
  def apply(labels: Column): Column =
    GraftColumnBridge.column(
      CanonicalLabels(GraftColumnBridge.expression(labels)))

  /** Shared by interpreted eval and generated code. */
  def canon(m: MapData): UTF8String = {
    val n = m.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val ka = m.keyArray()
    val va = m.valueArray()
    val ks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ks(i) = ka.getUTF8String(i); i += 1 }
    val idx = new Array[Int](n)
    i = 0
    while (i < n) { idx(i) = i; i += 1 }
    // insertion sort by key, UTF8String binary order (= array_sort's
    // struct ordering on the key field); label sets are a handful of
    // entries, so O(n²) beats any allocation-heavy alternative
    var a = 1
    while (a < n) {
      val t = idx(a)
      val kt = ks(t)
      var b = a - 1
      while (b >= 0 && ks(idx(b)).compareTo(kt) > 0) {
        idx(b + 1) = idx(b); b -= 1
      }
      idx(b + 1) = t
      a += 1
    }
    val sb = new java.lang.StringBuilder(32 * n)
    var first = true
    i = 0
    while (i < n) {
      val j = idx(i)
      if (!va.isNullAt(j)) { // null value: entry vanishes (concat→null)
        val v = va.getUTF8String(j)
        if (!first) sb.append(';')
        first = false
        val k = ks(j)
        sb.append(k.numChars()).append(':').append(k.toString)
          .append('=').append(v.numChars()).append(':').append(v.toString)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

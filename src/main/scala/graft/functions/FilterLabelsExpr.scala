package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native label-set projection — keep or drop a FIXED set of label
  * names. Replaces the `map_filter(labels, k => ...)` lambda forms
  * behind `labelsOn`/`labelsWithout`/`dropMetricName` and the binop
  * signature builds (`sigOn`/`sigWithout`): a lambda HOF evaluates
  * INTERPRETED per map entry, and binop matching computes one of
  * these per SAMPLE row. Entry order of the input map is preserved,
  * exactly like `map_filter` (output maps are user-visible).
  *
  * The name set is a constructor constant (query-time literal), so
  * membership is a hash probe on UTF8String bytes — no per-row set
  * construction, no per-entry expression interpretation. */
case class FilterLabels(child: Expression, names: Seq[String],
    keep: Boolean) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, StringType)
  override def prettyName: String = if (keep) "keep_labels" else "drop_labels"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(kt, vt, _)
        if (kt == StringType || kt == NullType) &&
          (vt == StringType || vt == NullType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects map<string,string>, got $other")
  }

  @transient private lazy val nameSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](names.size * 2)
    names.foreach(n => s.add(UTF8String.fromString(n)))
    s
  }

  override def nullSafeEval(m: Any): Any =
    FilterLabels.filter(m.asInstanceOf[MapData], nameSet, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("nameSet", nameSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, m =>
      s"graft.functions.FilterLabels.filter($m, $setRef, $keep)")
  }

  override protected def withNewChildInternal(newChild: Expression): FilterLabels =
    copy(child = newChild)
}

object FilterLabels {
  def keep(labels: Column, names: Seq[String]): Column =
    GraftColumnBridge.column(FilterLabels(
      GraftColumnBridge.expression(labels), names, keep = true))

  def drop(labels: Column, names: Seq[String]): Column =
    GraftColumnBridge.column(FilterLabels(
      GraftColumnBridge.expression(labels), names, keep = false))

  /** Shared by interpreted eval and generated code. Preserves input
    * entry order (the map_filter contract). */
  def filter(m: MapData, names: java.util.HashSet[UTF8String],
      keep: Boolean): MapData = {
    val n = m.numElements()
    if (n == 0) return m
    val ka = m.keyArray()
    val va = m.valueArray()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    var out = 0
    var i = 0
    while (i < n) {
      val k = ka.getUTF8String(i)
      if (names.contains(k) == keep) {
        ks(out) = k
        vs(out) = if (va.isNullAt(i)) null else va.getUTF8String(i)
        out += 1
      }
      i += 1
    }
    if (out == n) m
    else new ArrayBasedMapData(
      new GenericArrayData(java.util.Arrays.copyOf(
        ks.asInstanceOf[Array[AnyRef]], out)),
      new GenericArrayData(java.util.Arrays.copyOf(
        vs.asInstanceOf[Array[AnyRef]], out)))
  }
}

/** Native Go `strconv.FormatFloat(v, 'f', -1, 64)` formatting — the
  * `count_values` label value and every API-visible float string.
  * Replaces the Scala UDF (per-row encoder round-trip) with a static
  * call inside whole-stage codegen. */
case class GoFormatFloatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "go_format_float"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"go_format_float expects double, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      graft.exec.PromUdfs.goFormatFloat(v.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.exec.PromUdfs.goFormatFloat($v))")

  override protected def withNewChildInternal(newChild: Expression): GoFormatFloatExpr =
    copy(child = newChild)
}

object GoFormatFloatExpr {
  def apply(v: Column): Column =
    GraftColumnBridge.column(
      GoFormatFloatExpr(GraftColumnBridge.expression(v)))
}

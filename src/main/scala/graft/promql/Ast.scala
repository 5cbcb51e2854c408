package graft.promql

/** PromQL abstract syntax tree.
  *
  * Mirrors the node set of the reference's AST
  * (`vendor/github.com/prometheus/prometheus/promql/ast.go:100-238`) —
  * the shape is re-derived from the grammar, the evaluation is Spark-native.
  */
object Ast {

  sealed trait ValueType
  object ValueType {
    case object Scalar extends ValueType { override def toString = "scalar" }
    case object Vector extends ValueType { override def toString = "instant vector" }
    case object Matrix extends ValueType { override def toString = "range vector" }
    case object Str extends ValueType { override def toString = "string" }
  }

  sealed trait MatchType
  object MatchType {
    case object Eq extends MatchType       // =
    case object NotEq extends MatchType    // !=
    case object Regex extends MatchType    // =~
    case object NotRegex extends MatchType // !~
  }

  /** Label matcher; regexes are fully anchored `^(?:re)$` like the
    * reference (`pkg/labels/matcher.go:55-69`). */
  final case class LabelMatcher(typ: MatchType, name: String, value: String)

  sealed trait Cardinality
  object Cardinality {
    case object OneToOne extends Cardinality
    case object ManyToOne extends Cardinality  // group_left
    case object OneToMany extends Cardinality  // group_right
    case object ManyToMany extends Cardinality // and/or/unless
  }

  /** Vector-matching spec for binary ops (`ast.go:199-238`).
    * @param on true → match only on `matchingLabels`; false → ignoring them
    * @param include extra labels copied from the "one" side (group_x(lbls)) */
  final case class VectorMatching(
      card: Cardinality = Cardinality.OneToOne,
      matchingLabels: Seq[String] = Nil,
      on: Boolean = false,
      include: Seq[String] = Nil)

  sealed trait Expr { def typ: ValueType }

  final case class NumberLiteral(v: Double) extends Expr {
    def typ: ValueType = ValueType.Scalar
  }
  final case class StringLiteral(v: String) extends Expr {
    def typ: ValueType = ValueType.Str
  }
  final case class VectorSelector(
      name: Option[String],
      matchers: Seq[LabelMatcher],
      offsetMs: Long = 0L) extends Expr {
    def typ: ValueType = ValueType.Vector
  }
  final case class MatrixSelector(
      selector: VectorSelector,
      rangeMs: Long) extends Expr {
    def typ: ValueType = ValueType.Matrix
  }
  final case class ParenExpr(inner: Expr) extends Expr {
    def typ: ValueType = inner.typ
  }
  final case class UnaryExpr(op: String, inner: Expr) extends Expr {
    def typ: ValueType = inner.typ
  }
  final case class BinaryExpr(
      op: String,
      lhs: Expr,
      rhs: Expr,
      matching: Option[VectorMatching],
      returnBool: Boolean) extends Expr {
    def typ: ValueType =
      if (lhs.typ == ValueType.Scalar && rhs.typ == ValueType.Scalar)
        ValueType.Scalar
      else ValueType.Vector
  }
  /** `<op> [by|without (lbls)] (expr [, param])` */
  final case class AggregateExpr(
      op: String,
      expr: Expr,
      param: Option[Expr],
      grouping: Seq[String],
      without: Boolean) extends Expr {
    def typ: ValueType = ValueType.Vector
  }
  final case class Call(func: Function, args: Seq[Expr]) extends Expr {
    def typ: ValueType = func.returnType
  }

  /** Widest history reach of an expression below an evaluation step:
    * the max over its selectors of offset + (range window for matrix
    * selectors, the instant lookback for vector selectors). The
    * public-engine analogue is `FindMinTime`'s per-query start bound;
    * the rule evaluator uses it to extend a bounded read window so the
    * earliest evaluated steps still see their FULL range windows —
    * truncating at the window bound records silently-low values. */
  def maxLookbackMs(e: Expr, lookbackMs: Long): Long = e match {
    case VectorSelector(_, _, off) => off + lookbackMs
    case MatrixSelector(sel, r) => sel.offsetMs + r
    case ParenExpr(i) => maxLookbackMs(i, lookbackMs)
    case UnaryExpr(_, i) => maxLookbackMs(i, lookbackMs)
    case BinaryExpr(_, a, b, _, _) =>
      math.max(maxLookbackMs(a, lookbackMs), maxLookbackMs(b, lookbackMs))
    case AggregateExpr(_, ex, p, _, _) =>
      math.max(maxLookbackMs(ex, lookbackMs),
        p.map(maxLookbackMs(_, lookbackMs)).getOrElse(0L))
    case Call(_, args) =>
      (0L +: args.map(maxLookbackMs(_, lookbackMs))).max
    case _ => 0L
  }

  /** Fixed function registry (reference `promql/functions.go:957-1243`) —
    * PromQL has no user-defined functions. Variadic slots use defaults. */
  final case class Function(
      name: String,
      argTypes: Seq[ValueType],
      variadic: Int, // 0 = fixed arity; n>0 = up to n optional trailing args
      returnType: ValueType)

  import ValueType._
  val functions: Map[String, Function] = Seq(
    Function("abs", Seq(Vector), 0, Vector),
    Function("absent", Seq(Vector), 0, Vector),
    Function("avg_over_time", Seq(Matrix), 0, Vector),
    Function("ceil", Seq(Vector), 0, Vector),
    Function("changes", Seq(Matrix), 0, Vector),
    Function("clamp_max", Seq(Vector, Scalar), 0, Vector),
    Function("clamp_min", Seq(Vector, Scalar), 0, Vector),
    Function("count_over_time", Seq(Matrix), 0, Vector),
    Function("days_in_month", Seq(Vector), 1, Vector),
    Function("day_of_month", Seq(Vector), 1, Vector),
    Function("day_of_week", Seq(Vector), 1, Vector),
    Function("delta", Seq(Matrix), 0, Vector),
    Function("deriv", Seq(Matrix), 0, Vector),
    Function("exp", Seq(Vector), 0, Vector),
    Function("floor", Seq(Vector), 0, Vector),
    Function("histogram_quantile", Seq(Scalar, Vector), 0, Vector),
    Function("holt_winters", Seq(Matrix, Scalar, Scalar), 0, Vector),
    Function("hour", Seq(Vector), 1, Vector),
    Function("idelta", Seq(Matrix), 0, Vector),
    Function("increase", Seq(Matrix), 0, Vector),
    Function("irate", Seq(Matrix), 0, Vector),
    Function("label_replace", Seq(Vector, Str, Str, Str, Str), 0, Vector),
    Function("label_join", Seq(Vector, Str, Str, Str), -1, Vector),
    Function("ln", Seq(Vector), 0, Vector),
    Function("log10", Seq(Vector), 0, Vector),
    Function("log2", Seq(Vector), 0, Vector),
    Function("max_over_time", Seq(Matrix), 0, Vector),
    Function("min_over_time", Seq(Matrix), 0, Vector),
    Function("minute", Seq(Vector), 1, Vector),
    Function("month", Seq(Vector), 1, Vector),
    Function("predict_linear", Seq(Matrix, Scalar), 0, Vector),
    Function("quantile_over_time", Seq(Scalar, Matrix), 0, Vector),
    Function("rate", Seq(Matrix), 0, Vector),
    Function("resets", Seq(Matrix), 0, Vector),
    Function("round", Seq(Vector, Scalar), 1, Vector),
    Function("scalar", Seq(Vector), 0, Scalar),
    Function("sort", Seq(Vector), 0, Vector),
    Function("sort_desc", Seq(Vector), 0, Vector),
    Function("sqrt", Seq(Vector), 0, Vector),
    Function("stddev_over_time", Seq(Matrix), 0, Vector),
    Function("stdvar_over_time", Seq(Matrix), 0, Vector),
    Function("sum_over_time", Seq(Matrix), 0, Vector),
    Function("time", Seq(), 0, Scalar),
    Function("timestamp", Seq(Vector), 0, Vector),
    Function("vector", Seq(Scalar), 0, Vector),
    Function("year", Seq(Vector), 1, Vector)
  ).map(f => f.name -> f).toMap

  val aggregators: Set[String] = Set(
    "sum", "avg", "count", "min", "max", "stddev", "stdvar",
    "topk", "bottomk", "count_values", "quantile")
  val aggregatorsWithParam: Set[String] =
    Set("topk", "bottomk", "count_values", "quantile")

  val arithmeticOps: Set[String] = Set("+", "-", "*", "/", "%", "^")
  val comparisonOps: Set[String] = Set("==", "!=", ">", "<", ">=", "<=")
  val setOps: Set[String] = Set("and", "or", "unless")

  /** Ops whose result drops `__name__`
    * (reference `promql/engine.go:1460-1467`). */
  // engine.go:1460-1467: ONLY + - * / % drop the metric name — NOT ^
  // (itemPOW is deliberately absent), and bool comparisons keep it too
  // in this vintage
  def shouldDropMetricName(op: String): Boolean =
    op == "+" || op == "-" || op == "*" || op == "/" || op == "%"
}

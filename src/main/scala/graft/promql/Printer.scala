package graft.promql

import graft.promql.Ast._

/** PromQL AST printer — the analogue of the reference's `Expr.String()`
  * (`vendor/.../promql/printer.go:136-243`): every expression renders
  * back to parseable PromQL, and `parse(print(parse(q)))` is the
  * identity (round-trip asserted in `PrinterSpec`). Used for error
  * messages and query logging.
  *
  * Deviations from printer.go, both re-parse identically: keywords
  * print lowercase (`by`, `on`, `bool` — printer.go uppercases them;
  * the grammar is case-insensitive on keywords), and durations print
  * compact multi-unit (`model.Duration`-style `1h30m`), which
  * `Lexer.parseDuration` accepts.
  */
object Printer {

  def print(e: Expr): String = e match {
    case NumberLiteral(v) => graft.exec.PromUdfs.goFormatFloat(v)
    case StringLiteral(s) => quote(s)
    case vs: VectorSelector => vectorSelector(vs)
    case MatrixSelector(sel, rangeMs) =>
      // offset prints OUTSIDE the brackets (printer.go:186-194)
      val base = vectorSelector(sel.copy(offsetMs = 0))
      s"$base[${duration(rangeMs)}]${offset(sel.offsetMs)}"
    case ParenExpr(inner) => s"(${print(inner)})"
    case UnaryExpr(op, inner) => s"$op${print(inner)}"
    case BinaryExpr(op, lhs, rhs, matching, returnBool) =>
      val boolMod = if (returnBool) " bool" else ""
      val vm = matching match {
        case Some(m) if m.on || m.matchingLabels.nonEmpty =>
          val kind = if (m.on) "on" else "ignoring"
          val card = m.card match {
            case Cardinality.ManyToOne =>
              s" group_left(${m.include.mkString(", ")})"
            case Cardinality.OneToMany =>
              s" group_right(${m.include.mkString(", ")})"
            case _ => ""
          }
          s" $kind(${m.matchingLabels.mkString(", ")})$card"
        case _ => ""
      }
      s"${print(lhs)} $op$boolMod$vm ${print(rhs)}"
    case AggregateExpr(op, expr, param, grouping, without) =>
      val inner = param match {
        case Some(p) => s"${print(p)}, ${print(expr)}"
        case None => print(expr)
      }
      val group =
        if (grouping.isEmpty) ""
        else s" ${if (without) "without" else "by"}(${grouping.mkString(", ")})"
      s"$op($inner)$group"
    case Call(func, args) =>
      s"${func.name}(${args.map(print).mkString(", ")})"
  }

  private def vectorSelector(vs: VectorSelector): String = {
    // the name's own equality matcher is folded into the metric name
    // (printer.go:215-222); remaining matchers sort for determinism
    val ms = vs.matchers
      .filter(m => !(m.name == "__name__" && m.typ == MatchType.Eq &&
        vs.name.contains(m.value)))
      .map(matcher).sorted
    val sel = vs.name.getOrElse("") +
      (if (ms.isEmpty && vs.name.isDefined) ""
       else s"{${ms.mkString(",")}}")
    sel + offset(vs.offsetMs)
  }

  private def matcher(m: LabelMatcher): String = {
    val op = m.typ match {
      case MatchType.Eq => "="
      case MatchType.NotEq => "!="
      case MatchType.Regex => "=~"
      case MatchType.NotRegex => "!~"
    }
    s"${m.name}$op${quote(m.value)}"
  }

  private def offset(ms: Long): String =
    if (ms == 0) "" else s" offset ${duration(ms)}"

  /** The vintage Duration.String (common/model/time.go:215-249): ONE
    * unit — the largest of y w d h m s that divides exactly, else ms.
    * (90 minutes prints "90m", not "1h30m" — the reference's own
    * printed form re-parses under its single-unit grammar.) */
  def duration(ms: Long): String = {
    require(ms >= 0, s"duration must be non-negative, got $ms")
    // the reference Duration.String returns "0s" for the zero duration
    // (common/model/time.go:215-218); parseDuration rejects zero on
    // input, but printer paths (e.g. a defaulted subquery step) may
    // legally hold it
    if (ms == 0) return "0s"
    val units = Seq(
      "y" -> 365L * 24 * 3600 * 1000, "w" -> 7L * 24 * 3600 * 1000,
      "d" -> 24L * 3600 * 1000, "h" -> 3600000L, "m" -> 60000L,
      "s" -> 1000L)
    units.collectFirst { case (u, w) if ms % w == 0 => s"${ms / w}$u" }
      .getOrElse(s"${ms}ms")
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""
}

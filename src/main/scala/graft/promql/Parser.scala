package graft.promql

import Ast._
import Lexer._

/** Recursive-descent, precedence-climbing PromQL parser with parse-time
  * typechecking.
  *
  * Grammar, precedence and associativity follow the reference
  * (`vendor/github.com/prometheus/prometheus/promql/parse.go:442-540`,
  * `lex.go:95-120`): `or` < `and`/`unless` < comparisons < `+ -` <
  * `* / %` < `^` (right-assoc); unary `+ -` binds tighter than `^`'s left
  * operand. Typecheck rules mirror `parse.go:996-1121`.
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  def parse(input: String): Expr = {
    val toks = lex(input)
    // empty / whitespace-only input is its own diagnostic, not a
    // generic expected-token failure (`parse.go:150-153`)
    if (toks.head.typ == Lexer.EOF)
      throw ParseException(
        s"parse error at char ${toks.head.pos}: " +
          "no expression found in input")
    val p = new Parser(toks, input)
    val e = p.parseExpr(0)
    p.expectEOF()
    p.checkType(e)
    e
  }

  private val precedence: Map[String, Int] = Map(
    "or" -> 1,
    "and" -> 2, "unless" -> 2,
    "==" -> 3, "!=" -> 3, ">" -> 3, "<" -> 3, ">=" -> 3, "<=" -> 3,
    "+" -> 4, "-" -> 4,
    "*" -> 5, "/" -> 5, "%" -> 5,
    "^" -> 6)
  private val rightAssoc = Set("^")

  private val keywords = Set("by", "without", "on", "ignoring",
    "group_left", "group_right", "offset", "bool", "and", "or", "unless")
}

private final class Parser(toks: Vector[Lexer.Token], input: String = "") {
  import Ast._
  import Lexer._
  import Parser._

  private var pos = 0
  private def cur: Token = toks(pos)
  private def next(): Token = { val t = toks(pos); pos += 1; t }
  private def fail(msg: String): Nothing = throw ParseException(
    s"parse error at char ${cur.pos}: $msg")

  def expectEOF(): Unit =
    if (cur.typ != EOF) {
      // parse.go:85: could not parse remaining input %.15q...
      val rest = input.drop(cur.pos).take(15)
      fail(s"""could not parse remaining input "$rest"...""")
    }

  private def expect(t: TokType, what: String): Token = {
    if (cur.typ != t) fail(s"expected $what, got '${cur.text}'")
    next()
  }

  /** Keyword test, case-insensitive like the reference lexer: Go
    * lowercases the word before the keyword-table lookup
    * (`promql/lex.go:853`), so `SUM BY (l)`, `OFFSET 5m`, `== BOOL`
    * all parse. Function names stay case-sensitive — they are not in
    * the lexer's keyword table, and `getFunction` is an exact map
    * lookup (`parse.go:765-771`). */
  private def isKw(t: Token, k: String): Boolean =
    t.typ == IDENT && t.text.toLowerCase == k

  private def isBinOp(t: Token): Boolean = t.typ match {
    case OP => precedence.contains(t.text) && t.text != "=" &&
      t.text != "=~" && t.text != "!~"
    case IDENT => setOps.contains(t.text.toLowerCase)
    case _ => false
  }

  /** Precedence climbing. */
  def parseExpr(minPrec: Int): Expr = {
    var lhs = parseUnary()
    while (isBinOp(cur) && precedence(opText(cur)) >= minPrec) {
      val op = opText(next())
      // bool modifier (comparisons only)
      var returnBool = false
      if (isKw(cur, "bool")) {
        if (!comparisonOps.contains(op))
          fail("bool modifier can only be used on comparison operators")
        returnBool = true; next()
      }
      // vector matching modifiers
      var matching: Option[VectorMatching] = None
      if (isKw(cur, "on") || isKw(cur, "ignoring")) {
        val on = next().text.toLowerCase == "on"
        val lbls = parseLabelList()
        var card: Cardinality = if (setOps.contains(op))
          Cardinality.ManyToMany else Cardinality.OneToOne
        var include: Seq[String] = Nil
        if (isKw(cur, "group_left") || isKw(cur, "group_right")) {
          if (setOps.contains(op))
            fail(s"""no grouping allowed for "$op" operation""")
          card = if (next().text.toLowerCase == "group_left")
                   Cardinality.ManyToOne
                 else Cardinality.OneToMany
          if (cur.typ == LPAREN) include = parseLabelList()
        }
        matching = Some(VectorMatching(card, lbls, on, include))
      } else if (setOps.contains(op)) {
        matching = Some(VectorMatching(Cardinality.ManyToMany))
      } else if (isKw(cur, "group_left") || isKw(cur, "group_right")) {
        val card = if (next().text.toLowerCase == "group_left")
                     Cardinality.ManyToOne
                   else Cardinality.OneToMany
        val include =
          if (cur.typ == LPAREN) parseLabelList() else Nil
        matching = Some(VectorMatching(card, Nil, on = false, include))
      }
      val nextMin =
        if (rightAssoc.contains(op)) precedence(op) else precedence(op) + 1
      val rhs = parseExpr(nextMin)
      lhs = BinaryExpr(op, lhs, rhs, matching, returnBool)
    }
    lhs
  }

  private def opText(t: Token): String =
    if (t.typ == IDENT) t.text.toLowerCase else t.text

  private def parseUnary(): Expr = {
    if (cur.typ == OP && (cur.text == "-" || cur.text == "+")) {
      val op = next().text
      // the operand is a UNARY expression (primary/postfix chain), not
      // a binop climb: vintage unaryExpr() recurses into itself before
      // the expr() loop sees ANY operator (parse.go:546-560), so the
      // sign binds tighter than even `^` and `-1^2` is (-1)^2 = 1 —
      // the modern -(1^2) grammar postdates this vintage. Passing
      // precedence("^")+1 keeps every binop out of the operand.
      val inner = parseExpr(precedence("^") + 1)
      inner match {
        case NumberLiteral(v) if op == "-" => NumberLiteral(-v)
        case NumberLiteral(v) => NumberLiteral(v)
        case e => UnaryExpr(op, e)
      }
    } else parsePostfix(parsePrimary())
  }

  /** range selector `[5m]` and `offset 5m` postfix modifiers. */
  private def parsePostfix(e: Expr): Expr = {
    var res = e
    if (cur.typ == LBRACKET) {
      next()
      val d = expect(DURATION, "duration")
      expect(RBRACKET, "']'")
      res = res match {
        case vs: VectorSelector => MatrixSelector(vs, parseDuration(d.text))
        case _ => fail("range specification only allowed on vector selectors")
      }
    }
    if (isKw(cur, "offset")) {
      next()
      val d = expect(DURATION, "duration")
      val off = parseDuration(d.text)
      res = res match {
        case vs: VectorSelector => vs.copy(offsetMs = off)
        case MatrixSelector(vs, r) => MatrixSelector(vs.copy(offsetMs = off), r)
        case _ => fail("offset modifier only allowed on selectors")
      }
    }
    res
  }

  private def parsePrimary(): Expr = cur.typ match {
    case NUMBER => NumberLiteral(parseNumber(next().text))
    case STRING => StringLiteral(next().text)
    case LPAREN =>
      next()
      val e = parseExpr(0)
      expect(RPAREN, "')'")
      ParenExpr(e)
    case LBRACE => // nameless selector {job="x"}
      checkedSelector(None, parseMatchers())
    case IDENT =>
      val name = cur.text
      val lower = name.toLowerCase
      if (aggregators.contains(lower)) parseAggregate(lower)
      else if (functions.contains(name) && toks(pos + 1).typ == LPAREN)
        parseCall(name)
      else if (keywords.contains(lower)) fail(s"unexpected keyword '$name'")
      else if (toks(pos + 1).typ == LPAREN)
        // ident directly followed by '(' is a call shape — an unknown
        // name is a parse error, not a selector (parse.go:765-771)
        fail(s"""unknown function with name "$name"""")
      else {
        next()
        val matchers = if (cur.typ == LBRACE) parseMatchers() else Nil
        checkedSelector(Some(name), matchers)
      }
    case _ => fail(s"unexpected '${cur.text}'")
  }

  /** Selector guards (parse.go:960-974): at least one matcher, and at
    * least one matcher that does NOT match the empty string — prevents
    * implicit selection of every series via e.g. `{x=~".*"}`. */
  private def checkedSelector(name: Option[String],
      matchers: Seq[LabelMatcher]): VectorSelector = {
    // the metric name must not be set in the name position AND as a
    // __name__ matcher at once (parse.go:946-951)
    name.foreach { n =>
      matchers.find(_.name == "__name__").foreach { m =>
        fail(s"""metric name must not be set twice: "$n" or "${m.value}"""")
      }
    }
    val all = name
      .map(n => LabelMatcher(MatchType.Eq, "__name__", n)).toSeq ++ matchers
    if (all.isEmpty)
      fail("vector selector must contain label matchers or metric name")
    def matchesEmpty(m: LabelMatcher): Boolean = m.typ match {
      case MatchType.Eq => m.value.isEmpty
      case MatchType.NotEq => m.value.nonEmpty
      // patterns were validated by parseMatchers, so compile cannot
      // throw here (name-position selectors carry only Eq matchers)
      case MatchType.Regex =>
        Re2.compileAnchored(m.value).matcher("").matches()
      case MatchType.NotRegex =>
        !Re2.compileAnchored(m.value).matcher("").matches()
    }
    if (all.forall(matchesEmpty))
      fail("vector selector must contain at least one non-empty matcher")
    VectorSelector(name, matchers)
  }

  private def parseAggregate(op: String): Expr = {
    next() // aggregator keyword
    var grouping: Seq[String] = Nil
    var without = false
    var modifierSeen = false
    if (isKw(cur, "by") || isKw(cur, "without")) {
      without = next().text.toLowerCase == "without"
      grouping = parseLabelList()
      modifierSeen = true
    }
    expect(LPAREN, "'('")
    val args = scala.collection.mutable.ArrayBuffer[Expr]()
    args += parseExpr(0)
    while (cur.typ == COMMA) { next(); args += parseExpr(0) }
    expect(RPAREN, "')'")
    // trailing-modifier form: sum(x) by (l)
    if (!modifierSeen && (isKw(cur, "by") || isKw(cur, "without"))) {
      without = next().text.toLowerCase == "without"
      grouping = parseLabelList()
    }
    val (param, body) =
      if (aggregatorsWithParam.contains(op)) {
        if (args.length != 2)
          fail(s"wrong number of arguments for aggregate '$op': expected 2")
        (Some(args(0)), args(1))
      } else {
        if (args.length != 1)
          fail(s"wrong number of arguments for aggregate '$op': expected 1")
        (None, args(0))
      }
    AggregateExpr(op, body, param, grouping, without)
  }

  private def parseCall(name: String): Expr = {
    val fn = functions(name)
    next(); expect(LPAREN, "'('")
    val args = scala.collection.mutable.ArrayBuffer[Expr]()
    if (cur.typ != RPAREN) {
      args += parseExpr(0)
      while (cur.typ == COMMA) { next(); args += parseExpr(0) }
    }
    expect(RPAREN, "')'")
    // arity messages mirror parse.go:1083-1093 exactly (variadic < 0:
    // the last declared type repeats without bound)
    val nargs = fn.argTypes.length
    if (fn.variadic == 0) {
      if (args.length != nargs)
        fail(s"""expected $nargs argument(s) in call to "$name", got ${args.length}""")
    } else {
      val na = nargs - 1
      if (na > args.length)
        fail(s"""expected at least $na argument(s) in call to "$name", got ${args.length}""")
      else if (fn.variadic > 0 && na + fn.variadic < args.length)
        fail(s"""expected at most ${na + fn.variadic} argument(s) in call to "$name", got ${args.length}""")
    }
    Call(fn, args.toSeq)
  }

  /** A label-name token: the vintage validates the token TEXT, not
    * its type — `labels()` accepts any token whose value passes
    * isLabel (parse.go:686-690) and `lexInsideBraces` never
    * keywordizes (lex.go:558-572), so keywords AND the special
    * numbers `inf`/`nan` (which our lexer emits as NUMBER) are
    * ordinary label names in matchers and grouping lists. */
  private def expectLabelName(): String = {
    val t = cur
    val ok = t.typ == IDENT || (t.typ == NUMBER &&
      t.text.matches("[a-zA-Z_][a-zA-Z0-9_]*"))
    if (!ok) fail(s"expected label name, got '${t.text}'")
    next()
    t.text
  }

  private def parseLabelList(): Seq[String] = {
    expect(LPAREN, "'('")
    val lbls = scala.collection.mutable.ArrayBuffer[String]()
    if (cur.typ != RPAREN) {
      lbls += expectLabelName()
      while (cur.typ == COMMA) { next(); lbls += expectLabelName() }
    }
    expect(RPAREN, "')'")
    lbls.toSeq
  }

  private def parseMatchers(): Seq[LabelMatcher] = {
    expect(LBRACE, "'{'")
    val ms = scala.collection.mutable.ArrayBuffer[LabelMatcher]()
    while (cur.typ != RBRACE) {
      val name = expectLabelName()
      val op = expect(OP, "match operator").text
      val typ = op match {
        case "=" => MatchType.Eq
        case "!=" => MatchType.NotEq
        case "=~" => MatchType.Regex
        case "!~" => MatchType.NotRegex
        case other => fail(s"invalid label match operator '$other'")
      }
      val value = expect(STRING, "label value string").text
      // regex matchers compile at PARSE time like the reference's
      // NewMatcher (parse.go:919-931) — an invalid pattern is a parse
      // error (HTTP bad_data), not a runtime execution failure
      if (typ == MatchType.Regex || typ == MatchType.NotRegex)
        try Re2.compileAnchored(value)
        catch {
          case e: Re2.Re2SyntaxException =>
            fail(s"error parsing regexp: ${e.msg}")
          case e: java.util.regex.PatternSyntaxException =>
            fail(s"error parsing regexp: ${e.getDescription}: `$value`")
        }
      ms += LabelMatcher(typ, name, value)
      if (cur.typ == COMMA) next()
      else if (cur.typ != RBRACE) fail("expected ',' or '}'")
    }
    next() // }
    ms.toSeq
  }

  // ---- typecheck (parse.go:996-1121) ----

  def checkType(e: Expr): ValueType = e match {
    case NumberLiteral(_) => ValueType.Scalar
    case StringLiteral(_) => ValueType.Str
    case _: VectorSelector => ValueType.Vector
    case MatrixSelector(_, _) => ValueType.Matrix
    case ParenExpr(inner) => checkType(inner)
    case UnaryExpr(op, inner) =>
      val t = checkType(inner)
      if (t != ValueType.Scalar && t != ValueType.Vector)
        fail("unary expression only allowed on expressions of type " +
          s"""scalar or instant vector, got "$t"""")
      if (op != "-" && op != "+") fail(s"invalid unary operator '$op'")
      t
    case BinaryExpr(op, lhs, rhs, matching, returnBool) =>
      val lt = checkType(lhs); val rt = checkType(rhs)
      if (!arithmeticOps.contains(op) && !comparisonOps.contains(op) &&
          !setOps.contains(op))
        fail(s"""binary expression does not support operator "$op"""")
      for (t <- Seq(lt, rt))
        if (t != ValueType.Scalar && t != ValueType.Vector)
          fail(s"binary expression must contain only scalar and instant vector types")
      if (lt == ValueType.Scalar && rt == ValueType.Scalar) {
        if (setOps.contains(op))
          fail(s"""set operator "$op" not allowed in binary scalar expression""")
        if (comparisonOps.contains(op) && !returnBool)
          fail("comparisons between scalars must use BOOL modifier")
      }
      // parse.go:1061-1079: explicit on()/ignoring() labels on a
      // non-vector-vector operation are an error; otherwise the
      // matching is silently dropped and the scalar set-op check fires
      if (lt != ValueType.Vector || rt != ValueType.Vector)
        matching.foreach { m =>
          if (m.matchingLabels.nonEmpty)
            fail("vector matching only allowed between instant vectors")
        }
      if ((lt == ValueType.Scalar || rt == ValueType.Scalar) &&
          setOps.contains(op))
        fail(s"""set operator "$op" not allowed in binary scalar expression""")
      matching.foreach { m =>
        if (m.on)
          m.matchingLabels.intersect(m.include).headOption.foreach { l =>
            fail(s"""label "$l" must not occur in ON and GROUP clause at once""")
          }
      }
      if (lt == ValueType.Scalar && rt == ValueType.Scalar) ValueType.Scalar
      else ValueType.Vector
    case AggregateExpr(op, body, param, _, _) =>
      val bt = checkType(body)
      if (bt != ValueType.Vector)
        fail(s"expected type instant vector in aggregation expression, got $bt")
      param.foreach { p =>
        val pt = checkType(p)
        val want =
          if (op == "count_values") ValueType.Str else ValueType.Scalar
        if (pt != want)
          fail(s"expected type $want in aggregation parameter, got $pt")
      }
      ValueType.Vector
    case Call(fn, args) =>
      args.zipWithIndex.foreach { case (a, i) =>
        val want = fn.argTypes(math.min(i, fn.argTypes.length - 1))
        val got = checkType(a)
        if (got != want)
          fail(s"""expected type $want in call to function "${fn.name}", got $got""")
      }
      fn.returnType
  }
}

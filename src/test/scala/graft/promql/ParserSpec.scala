package graft.promql

import org.scalatest.funsuite.AnyFunSuite
import Ast._
import Parser.{parse, ParseException}

class ParserSpec extends AnyFunSuite {

  test("number literals") {
    assert(parse("1") == NumberLiteral(1))
    assert(parse("-2.5") == NumberLiteral(-2.5))
    assert(parse("0x1f") == NumberLiteral(31))
    assert(parse("Inf") == NumberLiteral(Double.PositiveInfinity))
    val NumberLiteral(nan) = (parse("NaN"): @unchecked)
    assert(nan.isNaN)
  }

  test("precedence: or < and < cmp < add < mul < pow (right assoc)") {
    val e = parse("1 + 2 * 3 ^ 2")
    // 1 + (2 * (3^2))
    assert(e == BinaryExpr("+", NumberLiteral(1),
      BinaryExpr("*", NumberLiteral(2),
        BinaryExpr("^", NumberLiteral(3), NumberLiteral(2), None, false),
        None, false), None, false))
    val p = parse("2 ^ 3 ^ 2")
    assert(p == BinaryExpr("^", NumberLiteral(2),
      BinaryExpr("^", NumberLiteral(3), NumberLiteral(2), None, false),
      None, false))
  }

  test("unary minus folds into the literal BEFORE pow, like the " +
      "vintage reference") {
    // vintage unaryExpr() folds the sign into a number literal before
    // the expr() binop loop runs (parse.go:546-560), so -2^2 parses as
    // (-2)^2 — the modern -(2^2) grammar postdates this vintage
    parse("-2^2") match {
      case BinaryExpr("^", NumberLiteral(-2.0), NumberLiteral(2.0), _, _) => ()
      case other => fail(s"unexpected: $other")
    }
    // a non-literal operand still binds under the unary before ^
    parse("-(2)^2") match {
      case BinaryExpr("^", UnaryExpr("-", _), NumberLiteral(2.0), _, _) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("selector with matchers and offset") {
    val e = parse("""http_requests{job="api", code=~"5.."} offset 5m""")
    assert(e == VectorSelector(Some("http_requests"), Seq(
      LabelMatcher(MatchType.Eq, "job", "api"),
      LabelMatcher(MatchType.Regex, "code", "5..")), 300000L))
  }

  test("matrix selector") {
    val e = parse("rate(foo[5m])")
    val Call(fn, Seq(MatrixSelector(vs, range))) = (e: @unchecked)
    assert(fn.name == "rate")
    assert(vs.name.contains("foo"))
    assert(range == 300000L)
  }

  test("compound and zero durations are rejected like the vintage " +
      "(model/time.go:180-213, parse.go:1131-1140)") {
    intercept[Exception](parse("rate(foo[1h30m])"))
    intercept[Exception](parse("rate(foo[0s])"))
    intercept[Exception](parse("foo offset 2h30m"))
    val Call(_, Seq(MatrixSelector(_, range))) =
      (parse("rate(foo[90m])"): @unchecked)
    assert(range == 5400000L)
  }

  test("aggregation with grouping, both modifier positions") {
    val e1 = parse("sum by (foo) (bar)")
    val e2 = parse("sum(bar) by (foo)")
    assert(e1 == AggregateExpr("sum", VectorSelector(Some("bar"), Nil), None,
      Seq("foo"), without = false))
    assert(e1 == e2)
    val e3 = parse("sum without (foo) (bar)")
    assert(e3.asInstanceOf[AggregateExpr].without)
  }

  test("aggregation with parameter") {
    val e = parse("topk(5, bar)")
    assert(e == AggregateExpr("topk", VectorSelector(Some("bar"), Nil),
      Some(NumberLiteral(5)), Nil, without = false))
    val q = parse("""count_values("version", build_info)""")
    assert(q.asInstanceOf[AggregateExpr].param.contains(StringLiteral("version")))
  }

  test("vector matching modifiers") {
    val e = parse("foo * on(a, b) group_left(c) bar")
    val BinaryExpr("*", _, _, Some(m), _) = (e: @unchecked)
    assert(m.on && m.matchingLabels == Seq("a", "b"))
    assert(m.card == Cardinality.ManyToOne)
    assert(m.include == Seq("c"))
  }

  test("set operators get many-to-many matching") {
    val BinaryExpr("and", _, _, Some(m), _) = (parse("foo and bar"): @unchecked)
    assert(m.card == Cardinality.ManyToMany)
  }

  test("bool modifier") {
    val BinaryExpr(">", _, _, _, b) = (parse("foo > bool 1"): @unchecked)
    assert(b)
  }

  test("typecheck failures") {
    assertThrows[ParseException](parse("1 and 2"))
    assertThrows[ParseException](parse("1 == 2")) // scalar cmp needs bool
    assertThrows[ParseException](parse("rate(foo)")) // wants matrix
    assertThrows[ParseException](parse("sum(foo[5m])")) // wants vector
    assertThrows[ParseException](parse("foo[5m] + 1")) // matrix in binop
    assertThrows[ParseException](parse("topk(foo)")) // missing param
    assertThrows[ParseException](parse("unknown_func(")) // syntax
  }

  /** Error-string parity with the reference's typecheck
    * (`promql/parse.go:983-1121`, `testdata` expectations in
    * `parse_test.go`): the message AFTER the position prefix must match
    * the reference byte-for-byte. */
  private def errOf(q: String): String = {
    val e = intercept[ParseException](parse(q))
    e.getMessage.replaceFirst("^parse error at char \\d+: ", "")
  }

  test("typecheck error strings match the reference") {
    assert(errOf("1 and 2") ==
      """set operator "and" not allowed in binary scalar expression""")
    assert(errOf("1 == 2") ==
      "comparisons between scalars must use BOOL modifier")
    assert(errOf("1 or foo") ==
      """set operator "or" not allowed in binary scalar expression""")
    assert(errOf("1 + on(a) foo") ==
      "vector matching only allowed between instant vectors")
    assert(errOf("foo and on(a) group_left bar") ==
      """no grouping allowed for "and" operation""")
    assert(errOf("foo + on(a) group_left(a) bar") ==
      """label "a" must not occur in ON and GROUP clause at once""")
    assert(errOf("rate(foo)") ==
      """expected type range vector in call to function "rate", got instant vector""")
    assert(errOf("sum(foo[5m])") ==
      "expected type instant vector in aggregation expression, got range vector")
    assert(errOf("-foo[5m]") ==
      "unary expression only allowed on expressions of type scalar or " +
        """instant vector, got "range vector"""")
    assert(errOf("nonexistent_function_rr(foo)") ==
      """unknown function with name "nonexistent_function_rr"""")
    assert(errOf("rate(foo[5m], bar)") ==
      """expected 1 argument(s) in call to "rate", got 2""")
    assert(errOf("round()") ==
      """expected at least 1 argument(s) in call to "round", got 0""")
    assert(errOf("round(foo, 2, 3)") ==
      """expected at most 2 argument(s) in call to "round", got 3""")
    assert(errOf("label_join(foo)") ==
      """expected at least 3 argument(s) in call to "label_join", got 1""")
    assert(errOf("foo bar and a longer tail") ==
      """could not parse remaining input "bar and a longe"...""")
  }

  test("nameless selector") {
    val e = parse("""{__name__=~"foo|bar", job="x"}""")
    val vs = e.asInstanceOf[VectorSelector]
    assert(vs.name.isEmpty && vs.matchers.length == 2)
  }

  test("function name used as metric name parses as selector") {
    assert(parse("rate") == VectorSelector(Some("rate"), Nil))
  }

  test("keywords are case-insensitive, function names are not") {
    // the reference lexer lowercases before its keyword lookup
    // (lex.go:853): aggregators and modifiers parse in any case
    assert(parse("SUM BY (l) (foo)") == parse("sum by (l) (foo)"))
    assert(parse("foo OFFSET 5m") == parse("foo offset 5m"))
    assert(parse("foo == BOOL bar") == parse("foo == bool bar"))
    assert(parse("foo AND On (l) bar") == parse("foo and on (l) bar"))
    assert(parse("foo / IGNORING (l) GROUP_LEFT bar") ==
      parse("foo / ignoring (l) group_left bar"))
    assert(parse("sum WITHOUT (l) (foo)") == parse("sum without (l) (foo)"))
    // functions are NOT keywords: getFunction is an exact map lookup
    // (parse.go:765-771), so a cased call is an unknown function...
    assert(intercept[ParseException](parse("Rate(foo[5m])")).msg
      .contains("""unknown function with name "Rate""""))
    // ...and a cased bare function name is just a metric selector
    assert(parse("Rate") == VectorSelector(Some("Rate"), Nil))
  }
}

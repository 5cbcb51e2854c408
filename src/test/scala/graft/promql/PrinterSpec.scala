package graft.promql

import org.scalatest.funsuite.AnyFunSuite

/** Printer round-trip: every printed expression re-parses, and printing
  * is a fixed point (print ∘ parse ∘ print = print), mirroring the
  * guarantee of the reference's `Expr.String()` (printer.go). */
class PrinterSpec extends AnyFunSuite {

  private def p(q: String): String = Printer.print(Parser.parse(q))

  private val corpus = Seq(
    "1 + 1",
    "-7 % 3",
    "2 ^ -0.5",
    "http_requests",
    """http_requests{job="api"}""",
    """http_requests{job="api", instance!="0"}""",
    """m{s=~"a|b", q!~"x.*"}""",
    "m offset 5m",
    "m[5m]",
    "m[90m]",
    "m[2d] offset 1d",
    "sum(m)",
    "sum by (job) (m)",
    "sum without (instance, job) (m)",
    "topk(3, m)",
    "quantile by (job) (0.9, m)",
    """count_values("v", m)""",
    "a + b",
    "a / on(job) b",
    "a * ignoring(dc) group_left(extra) b",
    "a - on(job, az) group_right() b",
    "a > bool b",
    "a and on() b",
    "a unless b",
    "rate(m[5m])",
    "histogram_quantile(0.9, bkt)",
    """label_replace(m, "dst", "$1", "src", "(.*)")""",
    "holt_winters(m[1h], 0.5, 0.5)",
    "round(m, 0.5)",
    "scalar(m)",
    "vector(5)",
    "time()",
    "-(m + 1)",
    "(a + b) * c",
    "sum(rate(m[5m])) / on() group_left sum(rate(n[5m]))",
    "absent(nothing{a=\"1\"})",
    "minute(vector(1707523200))"
  )

  test("printed form re-parses and printing is a fixed point") {
    corpus.foreach { q =>
      val once = p(q)
      val twice = Printer.print(Parser.parse(once))
      assert(once == twice, s"not a fixed point for '$q': '$once' vs '$twice'")
    }
  }

  test("exact shapes match the reference printer conventions") {
    assert(p("sum by (job) (m)") == "sum(m) by(job)")
    assert(p("m[2d] offset 1d") == "m[2d] offset 1d")
    assert(p("""m{b="2", a="1"}""") == """m{a="1",b="2"}""")
    assert(p("a / on(job) group_left b") == "a / on(job) group_left() b")
    assert(p("topk(3, m)") == "topk(3, m)")
    // vintage Duration.String is single-unit: the largest unit that
    // divides exactly (90s is not a whole number of minutes)
    assert(p("m[90s]") == "m[90s]")
    assert(p("m[120s]") == "m[2m]")
    assert(p("m[604800s]") == "m[1w]")
    assert(p("a > bool 5") == "a > bool 5")
    // the zero duration prints "0s" (common/model/time.go:217-219) —
    // unreachable from the parser (zero durations are rejected on
    // input) but any printer path holding one must match the reference
    assert(Printer.duration(0L) == "0s")
    intercept[IllegalArgumentException](Printer.duration(-1L))
  }

  test("string escapes survive the round trip") {
    val q = "m{x=\"a\\\"b\\\\c\"}"
    assert(p(q) == Printer.print(Parser.parse(p(q))))
  }

  test("seeded random typed ASTs: printed form re-parses to a fixed point") {
    import Ast._
    val rnd = new scala.util.Random(7)
    def name() = "mx_" + ('a' + rnd.nextInt(26)).toChar
    def lname() = "l" + ('a' + rnd.nextInt(26)).toChar
    def lval() = {
      val chars = "abz09 .*+?\"\\|"
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    def matchers(): Seq[LabelMatcher] = {
      val types = Seq(MatchType.Eq, MatchType.NotEq)
      (0 until (1 + rnd.nextInt(3)))
        .map(_ => LabelMatcher(types(rnd.nextInt(types.size)), lname(), lval()))
    }
    def selector(): VectorSelector =
      VectorSelector(Some(name()), matchers(),
        offsetMs = if (rnd.nextBoolean()) 0 else 60000L * (1 + rnd.nextInt(120)))
    def genScalar(d: Int): Expr =
      if (d <= 0 || rnd.nextInt(3) == 0)
        NumberLiteral(math.round(rnd.nextDouble() * 1e4) / 100.0)
      else BinaryExpr(Seq("+", "-", "*")(rnd.nextInt(3)),
        ParenExpr(genScalar(d - 1)), ParenExpr(genScalar(d - 1)), None, returnBool = false)
    def genVector(d: Int): Expr =
      if (d <= 0) selector()
      else rnd.nextInt(5) match {
        case 0 => selector()
        case 1 => AggregateExpr(
          Seq("sum", "min", "max", "avg")(rnd.nextInt(4)), genVector(d - 1),
          None, (0 until rnd.nextInt(3)).map(_ => lname()).distinct,
          without = rnd.nextBoolean())
        case 2 => Call(Ast.functions("rate"),
          Seq(MatrixSelector(selector(), 60000L * (1 + rnd.nextInt(60)))))
        case 3 => UnaryExpr("-", ParenExpr(genVector(d - 1)))
        case _ =>
          val vm = VectorMatching(Cardinality.OneToOne,
            (0 until rnd.nextInt(2)).map(_ => lname()).distinct,
            on = rnd.nextBoolean())
          BinaryExpr(Seq("+", "*", "/")(rnd.nextInt(3)),
            ParenExpr(genVector(d - 1)), ParenExpr(genVector(d - 1)),
            Some(vm), returnBool = false)
      }
    (1 to 300).foreach { _ =>
      val e = if (rnd.nextBoolean()) genVector(3) else genScalar(3)
      val once = Printer.print(e)
      val twice = Printer.print(Parser.parse(once))
      assert(once == twice, s"not a fixed point: '$once' vs '$twice'")
    }
  }
}

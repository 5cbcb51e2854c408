package graft.promql

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the RE2 → Java pattern facade: translations
  * preserve meaning, RE2-rejected constructs throw, and the shared
  * subset passes through byte-identical. */
class Re2Spec extends AnyFunSuite {

  private def ok(p: String): String = Re2.toJava(p)
  private def bad(p: String): Unit =
    assertThrows[Re2.Re2SyntaxException](Re2.toJava(p))

  test("shared subset passes through unchanged") {
    for (p <- Seq("a.c+", "(foo|bar)*", "x{2,3}?", "[a-z0-9_]+",
        "\\d+\\.\\d*", "^a$", "a|b|c",
        "[^\\]]", "\\Qa+b\\E", "(?:non)capturing", "\\p{L}+"))
      assert(ok(p) == p, p)
  }

  test("inline i gains UNICODE_CASE (RE2 case-folds in Unicode)") {
    assert(ok("(?i)abc") == "(?iu)abc")
    assert(ok("(?im:x)") == "(?ium:x)")
    assert(ok("(?s-i)x") == "(?s-iu)x")
    // (?i)σ must match Σ like RE2; bare Java (?i) would not
    assert(Re2.compileAnchored("(?i)σ").matcher("Σ").matches())
  }

  test("literal [ and & inside classes are escaped for Java") {
    // RE2 reads [a[b] as the class {a,[,b}; unescaped, Java would
    // open a nested class at the inner '['
    assert(ok("[a[b]") == "[a\\[b]")
    assert(Re2.compileAnchored("[a[b]").matcher("[").matches())
    // [a&&b] in RE2 is the class {a,&,b}; Java intersection = empty
    assert(ok("[a&&b]") == "[a\\&\\&b]")
    assert(Re2.compileAnchored("[a&&b]").matcher("&").matches())
    // the bracket-literal idiom [[] — Java alone throws Unclosed
    assert(ok("[[]") == "[\\[]")
    assert(Re2.compileAnchored("[[]").matcher("[").matches())
    // POSIX-class translation still wins over the escape
    assert(ok("[[:alpha:][]") == "[\\p{Alpha}\\[]")
  }

  test("repeat counts above RE2's 1000 cap are rejected") {
    bad("a{1001}"); bad("a{0,1001}"); bad("a{100000}"); bad("a{2000,}")
    bad("a{5,2}") // max < min: RE2 rejects, Java rejects too — ours first
    assert(ok("a{1000}") == "a{1000}")
    assert(ok("a{0,1000}") == "a{0,1000}")
    assert(ok("a{1000,}") == "a{1000,}")
  }

  test("(?P<name>) becomes Java's (?<name>) and stays matchable") {
    assert(ok("(?P<kind>[a-z]+)/.*") == "(?<kind>[a-z]+)/.*")
    val m = Re2.compileAnchored("(?P<a>x)(?P<b>y)").matcher("xy")
    assert(m.matches() && m.group("a") == "x" && m.group("b") == "y")
  }

  test("POSIX classes translate to Java's US-ASCII \\p names") {
    assert(ok("[[:alpha:]]") == "[\\p{Alpha}]")
    assert(ok("[[:^digit:]x]") == "[\\P{Digit}x]")
    assert(ok("[[:word:]-]") == "[\\w-]")
    assert(ok("[^[:space:]]") == "[^\\p{Space}]")
    assert(Re2.compileAnchored("[[:xdigit:]]+").matcher("1aF").matches())
    bad("[[:bogus:]]")
    bad("[[:alpha")
  }

  test("backreferences and \\k are rejected (RE2 has none)") {
    bad("(a)\\1")
    bad("(?P<g>a)\\k<g>")
    // \1 inside a character class is an octal-ish literal, not a
    // backreference — still rejected conservatively? No: classes keep
    // their escapes, and Java reads [\1] as octal char 1 like RE2
    assert(ok("[\\1]") == "[\\1]")
  }

  test("lookaround and Java-spelled named groups are rejected") {
    bad("a(?=b)"); bad("a(?!b)"); bad("(?<=a)b"); bad("(?<!a)b")
    bad("(?<name>a)")
  }

  test("possessive / nested quantifiers are rejected, lazy is kept") {
    bad("a++"); bad("a*+"); bad("a?*"); bad("a{2}{3}"); bad("a{2}+")
    assert(ok("a+?") == "a+?")
    assert(ok("a{2,}?b") == "a{2,}?b")
    // a brace that is not a quantifier is a literal in RE2; Java
    // rejects it unescaped ("Illegal repetition"), so it escapes
    assert(ok("a{,2}") == "a\\{,2}")
    assert(ok("{lit}") == "\\{lit}")
    assert(Re2.compileAnchored("a{,2}").matcher("a{,2}").matches())
    assert(Re2.compileAnchored("{lit}").matcher("{lit}").matches())
  }

  test("unsupported flags and escapes are rejected") {
    bad("(?U)a+?")
    bad("(?x)a b")
    bad("ab\\Z")
    bad("dangling\\")
  }

  test("compileAnchored wraps like matcher.go:61") {
    assert(Re2.compileAnchored("a|b").matcher("b").matches())
    assert(!Re2.compileAnchored("a|b").matcher("ab").matches())
    // invalid-in-both patterns still raise Java's diagnostic
    assertThrows[java.util.regex.PatternSyntaxException](
      Re2.compileAnchored("(unclosed"))
  }
}

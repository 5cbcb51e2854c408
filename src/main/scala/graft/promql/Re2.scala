package graft.promql

/** RE2 → Java-regex facade for user-supplied patterns (matchers and
  * `label_replace`).
  *
  * The reference compiles every user pattern with Go's RE2
  * (`pkg/labels/matcher.go:55-69`, `promql/functions.go:788-794`);
  * this engine executes them with `java.util.regex`. The two dialects
  * share a large common subset, but differ at the edges in BOTH
  * directions:
  *
  *   - RE2-legal, Java-alien: `(?P<name>…)` named groups and POSIX
  *     classes `[[:alpha:]]` — translated here to `(?<name>…)` and
  *     `\p{Alpha}`.
  *   - Java-legal, RE2-illegal: backreferences (`\1`, `\k<n>`),
  *     lookahead/lookbehind (`(?=` `(?!` `(?<=` `(?<!`), possessive
  *     and nested quantifiers (`a++`, `a*+`), the ungreedy flag
  *     `(?U)`, and `\Z` — rejected here so a pattern the reference
  *     refuses cannot silently succeed.
  *
  * Within the accepted subset the semantics coincide: Java's POSIX
  * `\p{Alpha}`-family is US-ASCII exactly like RE2's `[[:alpha:]]`;
  * the `m`/`s` inline flags agree, and `i` is rewritten to `iu`
  * because RE2 case-folds in Unicode while Java's bare `i` is
  * ASCII-only. Literal `[` and `&` inside character classes (legal in
  * RE2, class-opener/intersection in Java) are escaped, and repetition
  * counts above RE2's 1000 cap are rejected. (One residual divergence
  * is documented rather than handled: RE2 matches invalid-UTF8 input
  * bytewise, unreachable through this engine's String-typed labels.)
  */
object Re2 {

  final case class Re2SyntaxException(msg: String)
    extends IllegalArgumentException(msg)

  private def err(msg: String): Nothing = throw Re2SyntaxException(msg)

  /** `[[:name:]]` → Java US-ASCII class name (`word` has no `\p{…}`
    * spelling in Java; `\w` is its exact ASCII equivalent). */
  private val Posix: Map[String, String] = Map(
    "alnum" -> "\\p{Alnum}", "alpha" -> "\\p{Alpha}",
    "ascii" -> "\\p{ASCII}", "blank" -> "\\p{Blank}",
    "cntrl" -> "\\p{Cntrl}", "digit" -> "\\p{Digit}",
    "graph" -> "\\p{Graph}", "lower" -> "\\p{Lower}",
    "print" -> "\\p{Print}", "punct" -> "\\p{Punct}",
    "space" -> "\\p{Space}", "upper" -> "\\p{Upper}",
    "word" -> "\\w", "xdigit" -> "\\p{XDigit}")
  private val PosixNeg: Map[String, String] =
    Posix.map { case (k, v) =>
      k -> (if (v == "\\w") "\\W"
        else v.replace("\\p{", "\\P{"))
    }

  /** Translate an RE2 pattern to an equivalent Java pattern, or throw
    * [[Re2SyntaxException]] for constructs RE2 itself rejects. The
    * result is NOT validated — callers still `Pattern.compile` (or
    * `rlike`) it, so RE2-and-Java-invalid patterns (`"(a"`) fail
    * there with Java's diagnostic. */
  def toJava(p: String): String = {
    val out = new StringBuilder(p.length + 8)
    var i = 0
    var inClass = false
    // quantifier-nesting state: RE2 rejects a repetition applied to a
    // repetition (`a++`, `a*+`, `a{2}{3}`) where Java reads possessive
    // or stacked quantifiers; a single trailing `?` (lazy) is legal
    var afterQuant = false
    def quantHere(): Unit = {
      if (afterQuant)
        err("invalid nested repetition operator (RE2 has no " +
          "possessive quantifiers)")
      afterQuant = true
    }
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\') {
        if (i + 1 >= p.length) err("trailing backslash at end of expression")
        val n = p.charAt(i + 1)
        if (!inClass && n >= '1' && n <= '9')
          err(s"invalid escape sequence \\$n (RE2 has no backreferences)")
        if (!inClass && n == 'k')
          err("invalid escape sequence \\k (RE2 has no backreferences)")
        if (n == 'Z')
          err("invalid escape sequence \\Z (RE2 accepts \\z only)")
        out.append(c).append(n); i += 2
        // \p{Name} / \P{Name} / \x{hex}: the brace group belongs to
        // the escape (both dialects) — copy it verbatim so the
        // literal-brace escaping below cannot mangle it
        if ((n == 'p' || n == 'P' || n == 'x') &&
            i < p.length && p.charAt(i) == '{') {
          val end = p.indexOf('}', i)
          if (end < 0) err(s"missing closing } after \\$n{")
          out.append(p.substring(i, end + 1)); i = end + 1
        }
        afterQuant = false
      } else if (inClass) {
        if (c == '[' && i + 1 < p.length && p.charAt(i + 1) == ':') {
          val end = p.indexOf(":]", i + 2)
          if (end < 0) err("missing closing :] in character class")
          val raw = p.substring(i + 2, end)
          val (neg, name) =
            if (raw.startsWith("^")) (true, raw.substring(1)) else (false, raw)
          out.append((if (neg) PosixNeg else Posix).getOrElse(name,
            err(s"invalid character class range [:$raw:]")))
          i = end + 2
        } else if (c == '[' || c == '&') {
          // RE2 treats both as LITERALS inside a class; Java reads an
          // unescaped '[' as a nested-class opener and '&&' as class
          // intersection (and `[[]` as an unclosed class) — escape
          out.append('\\').append(c); i += 1
        } else {
          if (c == ']') inClass = false
          out.append(c); i += 1
        }
      } else c match {
        case '[' =>
          inClass = true
          out.append(c); i += 1
          // a leading ^ does not close the class; `]` right after it
          // would (RE2, unlike POSIX, rejects an unescaped leading ])
          if (i < p.length && p.charAt(i) == '^') { out.append('^'); i += 1 }
          afterQuant = false
        case '(' if p.startsWith("(?", i) =>
          if (p.startsWith("(?P<", i)) { out.append("(?<"); i += 4 }
          else if (p.startsWith("(?P", i))
            err("invalid named capture group syntax")
          else if (p.startsWith("(?=", i) || p.startsWith("(?!", i))
            err("RE2 has no lookahead assertions")
          else if (p.startsWith("(?<", i))
            err("RE2 has no lookbehind assertions " +
              "(named groups are (?P<name>…))")
          else {
            // (?flags) / (?flags:…) / (?:…) — flags limited to the
            // subset whose Java meaning coincides. RE2's `i` does
            // Unicode case folding; Java's is ASCII-only unless paired
            // with UNICODE_CASE, so every `i` is emitted as `iu`
            // (inside a `-` group that disables both, harmlessly).
            var j = i + 2
            out.append("(?")
            while (j < p.length && p.charAt(j) != ')' && p.charAt(j) != ':') {
              p.charAt(j) match {
                case 'U' => err("inline flag U (swap greediness) has " +
                  "no Java equivalent")
                case 'i' => out.append("iu")
                case f @ ('m' | 's' | '-') => out.append(f)
                case f => err(s"invalid or unsupported inline flag '$f'")
              }
              j += 1
            }
            i = j // the ')' or ':' is copied by the default case
          }
          afterQuant = false
        case '*' | '+' =>
          quantHere()
          out.append(c); i += 1
        case '?' =>
          // a ? directly after a quantifier is the lazy modifier
          // (legal in both dialects); after THAT, or after an atom,
          // it is itself a quantifier
          if (afterQuant) afterQuant = false else quantHere()
          out.append(c); i += 1
        case '{' =>
          // `{n}`, `{n,}`, `{n,m}` are repetitions; any other `{` is a
          // LITERAL in RE2 — Java instead errors ("Illegal
          // repetition"), so escape it
          val m = BraceQuant.findPrefixOf(p.substring(i))
          m match {
            case Some(q) =>
              quantHere()
              // RE2 caps repetition counts at 1000 (syntax.Parse
              // `invalid repeat count`); Java compiles any digits
              val body = q.substring(1, q.length - 1)
              val parts = body.split(",", -1)
              def num(s: String): Long = // >4 digits is already >1000
                if (s.length > 4) 1001L else s.toLong
              val lo = num(parts(0))
              val hi =
                if (parts.length == 1) lo
                else if (parts(1).isEmpty) lo
                else num(parts(1))
              if (lo > 1000 || hi > 1000 || hi < lo)
                err(s"invalid repeat count: `$q`")
              out.append(q); i += q.length
            case None =>
              out.append("\\{"); i += 1
              afterQuant = false
          }
        case _ =>
          out.append(c); i += 1
          afterQuant = false
      }
    }
    if (inClass) err("missing closing ] in character class")
    out.toString
  }

  private val BraceQuant = "\\{\\d+(?:,\\d*)?\\}".r

  /** Translate, wrap in the reference's full anchor
    * (`matcher.go:55-69` `^(?:re)$`), and compile — the one-stop call
    * for matcher evaluation sites. Throws [[Re2SyntaxException]] for
    * RE2-rejected constructs and Java's `PatternSyntaxException` for
    * patterns invalid in both dialects. */
  def compileAnchored(p: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile("^(?:" + toJava(p) + ")$")
}

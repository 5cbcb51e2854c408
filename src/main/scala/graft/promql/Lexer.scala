package graft.promql

/** Hand-written PromQL lexer.
  *
  * Token set mirrors the reference lexer
  * (`vendor/github.com/prometheus/prometheus/promql/lex.go`): identifiers
  * (metric names may contain `:`), numbers (decimal, hex, `Inf`, `NaN`),
  * durations (`5m`; compound forms lex as one token and fail in
  * parseDuration like the vintage), strings (single/double quoted with Go escape
  * sequences, backtick raw), operators and delimiters.
  */
object Lexer {

  sealed trait TokType
  case object IDENT extends TokType      // identifier / keyword / metric name
  case object NUMBER extends TokType
  case object STRING extends TokType
  case object DURATION extends TokType
  case object OP extends TokType         // + - * / % ^ == != > < >= <= =~ !~ =
  case object LPAREN extends TokType
  case object RPAREN extends TokType
  case object LBRACE extends TokType
  case object RBRACE extends TokType
  case object LBRACKET extends TokType
  case object RBRACKET extends TokType
  case object COMMA extends TokType
  case object EOF extends TokType

  final case class Token(typ: TokType, text: String, pos: Int)

  final case class LexException(msg: String) extends RuntimeException(msg)

  private val durationUnits = Map(
    "ms" -> 1L, "s" -> 1000L, "m" -> 60000L, "h" -> 3600000L,
    "d" -> 86400000L, "w" -> 604800000L, "y" -> 31536000000L)

  /** Parse a duration literal to milliseconds — the vintage grammar
    * EXACTLY (common/model/time.go:180-213 `^([0-9]+)(y|w|d|h|m|s|ms)$`
    * + parse.go:1131-1140's zero rejection): ONE integer, ONE unit.
    * Compound forms (`1h30m`) are rejected like the reference rejects
    * them — the API duration params ride through here too, so the
    * error surface matches api.go's. */
  def parseDuration(s: String): Long = {
    val ms = modelDuration(s)
    if (ms == 0) throw LexException("duration must be greater than 0")
    ms
  }

  /** model.ParseDuration itself: zero is VALID here (the test harness
    * and API layers accept `0s`; only the PromQL parser's wrapper
    * above rejects it, mirroring the reference's split). */
  def modelDuration(s: String): Long = {
    val re = "^([0-9]+)(y|w|d|h|m|s|ms)$".r
    s match {
      case re(n, u) => n.toLong * durationUnits(u)
      case _ => throw LexException(s"""not a valid duration string: "$s"""")
    }
  }

  def lex(input: String): Vector[Token] = {
    val toks = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = input.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { i += 1 }
      else if (c == '#') { while (i < n && input.charAt(i) != '\n') i += 1 }
      else if (c == '(') { toks += Token(LPAREN, "(", i); i += 1 }
      else if (c == ')') { toks += Token(RPAREN, ")", i); i += 1 }
      else if (c == '{') { toks += Token(LBRACE, "{", i); i += 1 }
      else if (c == '}') { toks += Token(RBRACE, "}", i); i += 1 }
      else if (c == '[') { toks += Token(LBRACKET, "[", i); i += 1 }
      else if (c == ']') { toks += Token(RBRACKET, "]", i); i += 1 }
      else if (c == ',') { toks += Token(COMMA, ",", i); i += 1 }
      else if (c == '"' || c == '\'') { val (s, j) = lexString(input, i, c); toks += Token(STRING, s, i); i = j }
      else if (c == '`') {
        val end = input.indexOf('`', i + 1)
        if (end < 0) throw LexException("unterminated raw string")
        toks += Token(STRING, input.substring(i + 1, end), i); i = end + 1
      }
      else if (c == '=' && peek(1) == '=') { toks += Token(OP, "==", i); i += 2 }
      else if (c == '=' && peek(1) == '~') { toks += Token(OP, "=~", i); i += 2 }
      else if (c == '=') { toks += Token(OP, "=", i); i += 1 }
      else if (c == '!' && peek(1) == '=') { toks += Token(OP, "!=", i); i += 2 }
      else if (c == '!' && peek(1) == '~') { toks += Token(OP, "!~", i); i += 2 }
      else if (c == '>' && peek(1) == '=') { toks += Token(OP, ">=", i); i += 2 }
      else if (c == '<' && peek(1) == '=') { toks += Token(OP, "<=", i); i += 2 }
      else if (c == '>') { toks += Token(OP, ">", i); i += 1 }
      else if (c == '<') { toks += Token(OP, "<", i); i += 1 }
      else if ("+-*/%^".indexOf(c) >= 0) { toks += Token(OP, c.toString, i); i += 1 }
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        if (c == '0' && (peek(1) == 'x' || peek(1) == 'X')) {
          i += 2
          while (i < n && isHex(input.charAt(i))) i += 1
          toks += Token(NUMBER, input.substring(start, i), start)
        } else {
          // Try a duration first: one or more [0-9]+unit groups, maximal.
          val durMatch = durationRe.findPrefixOf(input.substring(start))
          durMatch match {
            case Some(d) if start + d.length >= n ||
                !isIdentChar(input.charAt(start + d.length)) =>
              toks += Token(DURATION, d, start); i = start + d.length
            case _ =>
              while (i < n && input.charAt(i).isDigit) i += 1
              if (i < n && input.charAt(i) == '.') {
                i += 1; while (i < n && input.charAt(i).isDigit) i += 1
              }
              if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
                i += 1
                if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
                while (i < n && input.charAt(i).isDigit) i += 1
              }
              toks += Token(NUMBER, input.substring(start, i), start)
          }
        }
      }
      else if (c.isLetter || c == '_' || c == ':') {
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit ||
          input.charAt(i) == '_' || input.charAt(i) == ':')) i += 1
        val text = input.substring(start, i)
        val lower = text.toLowerCase
        if (lower == "inf" || lower == "nan") toks += Token(NUMBER, text, start)
        else toks += Token(IDENT, text, start)
      }
      else throw LexException(s"unexpected character '${c}' at position $i")
    }
    toks += Token(EOF, "", n)
    toks.result()
  }

  private val durationRe = "([0-9]+(?:ms|s|m|h|d|w|y))+".r

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == ':' || c == '.'

  private def isHex(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Quoted-string body with the Go escape set the vintage accepts
    * (lex.go:649-699 lexEscape / strutil.Unquote, both deferring to
    * go/scanner semantics): `\\a \\b \\f \\n \\r \\t \\v` and quotes, octal
    * `\\123` (3 digits, <= 255), `\\x..` (2 hex), `\\u....` (4 hex),
    * `\\U........` (8 hex, any rune below MaxRune, surrogates
    * rejected). A LITERAL newline inside a quoted string is a syntax
    * error like strutil.Unquote's contains-newline check (raw
    * backtick strings keep accepting them). */
  private def lexString(input: String, start: Int, quote: Char): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    val n = input.length
    def radixEscape(digits: Int, radix: Int, max: Int, skip: Int): Unit = {
      if (i + skip + digits > n) throw LexException("escape sequence not terminated")
      val body = input.substring(i + skip, i + skip + digits)
      val v =
        try Integer.parseInt(body, radix)
        catch { case _: NumberFormatException =>
          throw LexException(s"illegal character in escape sequence: $body") }
      if (v > max || (v >= 0xD800 && v <= 0xDFFF))
        throw LexException("escape sequence is invalid Unicode code point")
      sb.appendAll(Character.toChars(v)); i += skip + digits
    }
    while (i < n && input.charAt(i) != quote) {
      val c = input.charAt(i)
      if (c == '\n')
        throw LexException("unterminated string (literal newline)")
      if (c == '\\') {
        if (i + 1 >= n) throw LexException("unterminated string escape")
        input.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '\'' => sb += '\''; i += 2
          case '"' => sb += '"'; i += 2
          case 'a' => sb += '\u0007'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case 'v' => sb += '\u000B'; i += 2
          case d if d >= '0' && d <= '7' => radixEscape(3, 8, 255, 1)
          case 'x' => radixEscape(2, 16, 255, 2)
          case 'u' => radixEscape(4, 16, Character.MAX_CODE_POINT, 2)
          case 'U' => radixEscape(8, 16, Character.MAX_CODE_POINT, 2)
          case other => throw LexException(s"unknown escape \\$other")
        }
      } else { sb += c; i += 1 }
    }
    if (i >= n) throw LexException("unterminated string")
    (sb.toString, i + 1)
  }

  def parseNumber(text: String): Double = {
    val lower = text.toLowerCase
    if (lower == "inf" || lower == "+inf") Double.PositiveInfinity
    else if (lower == "-inf") Double.NegativeInfinity
    else if (lower == "nan") Double.NaN
    else if (lower.startsWith("0x")) java.lang.Long.parseLong(text.substring(2), 16).toDouble
    else text.toDouble
  }
}

package graft.expr

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled recursive-descent parser for the filter expression language.
  *
  * Token + error behavior mirrors the reference Lark grammar
  * (/root/reference/parq_tools/utils/_query_parser.py:11-30) and its test
  * contract (/root/reference/test/filter/test_parser.py):
  *   - `a >> 1`, `b = 2`, `c >`, leading/trailing and/or, `()` → parse error
  *   - `.5` (leading-dot decimal) → parse error; `1.5` ok; numbers are unsigned
  *   - `a in []` is legal (matches nothing)
  *   - mixed-type `in` lists (`[1, "x"]`, `[1, 2.5]`) → error (int ≠ float,
  *     exactly like Python's type() check at _query_parser.py:97-101)
  */
object FilterParser {

  // ---- lexer -------------------------------------------------------------

  private sealed trait Tok { def pos: Int }
  private final case class TIdent(s: String, pos: Int) extends Tok
  private final case class TOp(s: String, pos: Int) extends Tok
  private final case class TNum(s: String, pos: Int) extends Tok
  private final case class TStr(s: String, pos: Int) extends Tok
  private final case class TPunct(s: String, pos: Int) extends Tok // ( ) [ ] ,
  private final case class TEnd(pos: Int) extends Tok

  private def fail(msg: String): Nothing = throw new FilterParseException(msg)

  private def tokenize(s: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TIdent(s.substring(start, i), start)
      } else if (c.isDigit) {
        val start = i
        while (i < n && s(i).isDigit) i += 1
        if (i < n && s(i) == '.') {
          i += 1
          if (i >= n || !s(i).isDigit)
            fail(s"Malformed number at position $start in filter expression: '$s'")
          while (i < n && s(i).isDigit) i += 1
        }
        // a trailing letter glued to a number (e.g. 1x) is malformed
        if (i < n && (s(i).isLetter || s(i) == '_'))
          fail(s"Malformed number at position $start in filter expression: '$s'")
        out += TNum(s.substring(start, i), start)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val start = i
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val ch = s(i)
          if (ch == quote) { closed = true; i += 1 }
          else if (ch == '\\' && quote == '"' && i + 1 < n) {
            // double-quoted strings accept escapes (Lark ESCAPED_STRING)
            sb += s(i + 1); i += 2
          } else { sb += ch; i += 1 }
        }
        if (!closed) fail(s"Unterminated string at position $start in filter expression: '$s'")
        out += TStr(sb.toString, start)
      } else if (c == '>' || c == '<') {
        if (i + 1 < n && s(i + 1) == '=') { out += TOp(s.substring(i, i + 2), i); i += 2 }
        else if (i + 1 < n && (s(i + 1) == '>' || s(i + 1) == '<'))
          fail(s"Invalid operator '${s.substring(i, i + 2)}' at position $i in filter expression: '$s'")
        else { out += TOp(c.toString, i); i += 1 }
      } else if (c == '=' || c == '!') {
        if (i + 1 < n && s(i + 1) == '=') { out += TOp(s.substring(i, i + 2), i); i += 2 }
        else fail(s"Invalid operator '$c' at position $i in filter expression: '$s'")
      } else if (c == '(' || c == ')' || c == '[' || c == ']' || c == ',') {
        out += TPunct(c.toString, i); i += 1
      } else {
        fail(s"Unexpected character '$c' at position $i in filter expression: '$s'")
      }
    }
    out += TEnd(n)
    out.toVector
  }

  // ---- parser ------------------------------------------------------------

  def parse(input: String): FilterAst = {
    val toks = tokenize(input)
    var pos = 0
    def peek: Tok = toks(pos)
    def advance(): Tok = { val t = toks(pos); pos += 1; t }

    def parseValue(): FilterAst.Value = advance() match {
      case TNum(s, _) =>
        if (s.contains('.')) FilterAst.FloatVal(s.toDouble) else FilterAst.IntVal(s.toLong)
      case TStr(s, _) => FilterAst.StrVal(s)
      case t => fail(s"Expected a value at position ${t.pos} in filter expression: '$input'")
    }

    def parsePrimary(): FilterAst = peek match {
      case TPunct("(", p) =>
        advance()
        if (peek.isInstanceOf[TPunct] && peek.asInstanceOf[TPunct].s == ")")
          fail(s"Empty group at position $p in filter expression: '$input'")
        val inner = parseOr()
        peek match {
          case TPunct(")", _) => advance(); inner
          case t => fail(s"Expected ')' at position ${t.pos} in filter expression: '$input'")
        }
      case TIdent(name, p) if name != "and" && name != "or" && name != "in" =>
        advance()
        peek match {
          case TOp(op, _) =>
            advance()
            FilterAst.Cmp(name, op, parseValue())
          case TIdent("in", _) =>
            advance()
            peek match {
              case TPunct("[", _) =>
                advance()
                val values = ArrayBuffer.empty[FilterAst.Value]
                peek match {
                  case TPunct("]", _) => advance()
                  case _ =>
                    values += parseValue()
                    var done = false
                    while (!done) peek match {
                      case TPunct(",", _) => advance(); values += parseValue()
                      case TPunct("]", _) => advance(); done = true
                      case t => fail(s"Expected ',' or ']' at position ${t.pos} in filter expression: '$input'")
                    }
                }
                val types = values.map(_.typeName).toSet
                if (types.size > 1)
                  fail(s"All values in an 'in' list must be the same type, got: ${values.map(_.typeName).mkString("[", ", ", "]")}")
                FilterAst.In(name, values.toSeq)
              case t => fail(s"Expected '[' after 'in' at position ${t.pos} in filter expression: '$input'")
            }
          case t => fail(s"Expected a comparison operator or 'in' after column '$name' at position ${t.pos} in filter expression: '$input'")
        }
      case t => fail(s"Unexpected token at position ${t.pos} in filter expression: '$input'")
    }

    def parseAnd(): FilterAst = {
      var left = parsePrimary()
      var more = true
      while (more) peek match {
        case TIdent("and", _) => advance(); left = FilterAst.And(left, parsePrimary())
        case _ => more = false
      }
      left
    }

    def parseOr(): FilterAst = {
      var left = parseAnd()
      var more = true
      while (more) peek match {
        case TIdent("or", _) => advance(); left = FilterAst.Or(left, parseAnd())
        case _ => more = false
      }
      left
    }

    if (input.trim.isEmpty) fail("Empty filter expression")
    val ast = parseOr()
    peek match {
      case TEnd(_) => ast
      case t => fail(s"Unexpected trailing input at position ${t.pos} in filter expression: '$input'")
    }
  }

  /** Column names referenced in a filter query (reference: _query_parser.py:118-144). */
  def referencedColumns(input: String): Set[String] =
    FilterAst.referencedColumns(parse(input))
}

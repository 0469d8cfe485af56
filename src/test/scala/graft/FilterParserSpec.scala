package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{FilterAst, FilterParseException, FilterParser}

/** Mirrors /root/reference/test/filter/test_parser.py case-for-case. */
class FilterParserSpec extends AnyFunSuite {

  test("simple comparisons") {
    for (e <- Seq("a > 1", "b < 2", "c >= 3", "d <= 4", "e == 5", "f != 6",
                  "g > 1.5", "h <= 0.0"))
      assert(FilterParser.parse(e) != null)
  }

  test("logical operators with and/or precedence") {
    val ast = FilterParser.parse("a > 1 and b < 2 or c == 3")
    // and binds tighter than or
    ast match {
      case FilterAst.Or(FilterAst.And(_, _), FilterAst.Cmp("c", "==", _)) => ()
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("grouping") {
    val ast = FilterParser.parse("(a > 1 and (b < 2 or c == 3))")
    ast match {
      case FilterAst.And(FilterAst.Cmp("a", ">", _), FilterAst.Or(_, _)) => ()
      case other => fail(s"unexpected shape: $other")
    }
  }

  test("column extraction") {
    assert(FilterParser.referencedColumns("a > 1 and (b < 2 or c == 3)") == Set("a", "b", "c"))
    assert(FilterParser.referencedColumns("foo >= 10 or bar != 5") == Set("foo", "bar"))
  }

  test("invalid syntax raises") {
    for (e <- Seq("a >> 1", "b = 2", "c >", "and a > 1", "a > 1 or", "()"))
      assertThrows[FilterParseException](FilterParser.parse(e))
  }

  test("edge cases: whitespace, leading-dot decimal, large numbers") {
    assert(FilterParser.parse("   a   >   1   ") != null)
    assertThrows[FilterParseException](FilterParser.parse("a > .5"))
    assert(FilterParser.parse("a < 1234567890") != null)
  }

  test("in operator: numeric, string, empty list") {
    assert(FilterParser.parse("a in [1, 2, 3]") != null)
    assert(FilterParser.parse("b in [\"foo\", \"bar\", \"baz\"]") != null)
    assert(FilterParser.parse("c in ['x', 'y', 'z']") != null)
    FilterParser.parse("a in []") match {
      case FilterAst.In("a", vs) => assert(vs.isEmpty)
      case other => fail(s"unexpected: $other")
    }
  }

  test("in operator: mixed types raise") {
    val ex = intercept[FilterParseException](FilterParser.parse("d in [1, \"foo\", 2, \"bar\"]"))
    assert(ex.getMessage.contains("must be the same type"))
    // int vs float are distinct types, as in the reference's Python type() check
    assertThrows[FilterParseException](FilterParser.parse("d in [1, 2.5]"))
  }

  test("in column extraction") {
    assert(FilterParser.referencedColumns("a in [1, 2, 3] and b in [\"foo\", \"bar\"]") == Set("a", "b"))
  }

  test("invalid in syntax raises") {
    for (e <- Seq("b in", "c in [", "d in [1 2 3]"))
      assertThrows[FilterParseException](FilterParser.parse(e))
  }

  test("string values: quotes and equality") {
    FilterParser.parse("s == 'hello world'") match {
      case FilterAst.Cmp("s", "==", FilterAst.StrVal("hello world")) => ()
      case other => fail(s"unexpected: $other")
    }
    FilterParser.parse("s != \"x\"") match {
      case FilterAst.Cmp("s", "!=", FilterAst.StrVal("x")) => ()
      case other => fail(s"unexpected: $other")
    }
  }
}

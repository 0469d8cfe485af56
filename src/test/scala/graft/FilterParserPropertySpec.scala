package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.expr.{FilterAst, FilterParser}

/** Property tests for the expression language (SURVEY §5 test plan):
  * generated ASTs render to strings that parse back to the same AST, and
  * precedence/grouping laws hold. */
object FilterParserPropertySpec extends Properties("FilterParser") {

  private val genIdent: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
    s = (h :: t).mkString
    if !Set("and", "or", "in").contains(s)
  } yield s

  private val genValue: Gen[FilterAst.Value] = Gen.oneOf(
    Gen.choose(0L, 1000000L).map(FilterAst.IntVal),
    Gen.choose(0L, 999L).flatMap(i => Gen.choose(1, 99).map(f =>
      FilterAst.FloatVal(s"$i.$f".toDouble))),
    Gen.listOfN(4, Gen.alphaNumChar).map(cs => FilterAst.StrVal(cs.mkString)))

  private val genCmp: Gen[FilterAst] = for {
    c <- genIdent
    op <- Gen.oneOf(">", "<", ">=", "<=", "==", "!=")
    v <- genValue
  } yield FilterAst.Cmp(c, op, v)

  private val genIn: Gen[FilterAst] = for {
    c <- genIdent
    // homogeneous list (mixed types are a parse error by contract)
    vs <- Gen.oneOf(
      Gen.listOfN(3, Gen.choose(0L, 999L).map(FilterAst.IntVal)),
      Gen.listOfN(2, Gen.listOfN(3, Gen.alphaNumChar).map(cs => FilterAst.StrVal(cs.mkString))),
      Gen.const(Nil))
  } yield FilterAst.In(c, vs)

  private def genAst(depth: Int): Gen[FilterAst] =
    if (depth == 0) Gen.oneOf(genCmp, genIn)
    else Gen.oneOf(
      genCmp, genIn,
      Gen.lzy(for { l <- genAst(depth - 1); r <- genAst(depth - 1) } yield FilterAst.And(l, r)),
      Gen.lzy(for { l <- genAst(depth - 1); r <- genAst(depth - 1) } yield FilterAst.Or(l, r)))

  /** Render with explicit parens everywhere — must parse back identically. */
  private def render(ast: FilterAst): String = ast match {
    case FilterAst.Cmp(c, op, v) => s"$c $op ${renderValue(v)}"
    case FilterAst.In(c, vs) => s"$c in [${vs.map(renderValue).mkString(", ")}]"
    case FilterAst.And(l, r) => s"(${render(l)} and ${render(r)})"
    case FilterAst.Or(l, r) => s"(${render(l)} or ${render(r)})"
  }

  private def renderValue(v: FilterAst.Value): String = v match {
    case FilterAst.IntVal(i) => i.toString
    case FilterAst.FloatVal(d) => d.toString
    case FilterAst.StrVal(s) => s""""$s""""
  }

  property("render ∘ parse is identity") = Prop.forAll(genAst(3)) { ast =>
    FilterParser.parse(render(ast)) == ast
  }

  property("referenced columns = columns in the AST") = Prop.forAll(genAst(3)) { ast =>
    FilterParser.referencedColumns(render(ast)) == FilterAst.referencedColumns(ast)
  }

  property("and binds tighter than or (unparenthesized)") =
    Prop.forAll(genCmp, genCmp, genCmp) { (a, b, c) =>
      val s = s"${render(a)} or ${render(b)} and ${render(c)}"
      FilterParser.parse(s) == FilterAst.Or(a, FilterAst.And(b, c))
    }

  property("whitespace is insignificant") = Prop.forAll(genCmp) { cmp =>
    FilterParser.parse("   " + render(cmp).replace(" ", "   ") + "  ") == cmp
  }
}

package graft.expr

/** AST for the pandas-style filter expression language.
  *
  * Grammar (reference: /root/reference/parq_tools/utils/_query_parser.py:11-30):
  * {{{
  *   expr       ::= orExpr
  *   orExpr     ::= andExpr ("or" andExpr)*
  *   andExpr    ::= primary ("and" primary)*
  *   primary    ::= "(" expr ")" | COLUMN OP VALUE | COLUMN "in" list
  *   OP         ::= ">" | "<" | ">=" | "<=" | "==" | "!="
  *   VALUE      ::= NUMBER | double-quoted string | single-quoted string
  *   NUMBER     ::= \d+(\.\d+)?          (no sign, no leading-dot decimals)
  *   list       ::= "[" (VALUE ("," VALUE)*)? "]"   (empty list is legal)
  * }}}
  * `and` binds tighter than `or` (pandas/SQL precedence).
  */
sealed trait FilterAst

object FilterAst {
  sealed trait Value { def scalaValue: Any; def typeName: String }
  final case class IntVal(v: Long) extends Value {
    def scalaValue: Any = v; def typeName = "int"
  }
  final case class FloatVal(v: Double) extends Value {
    def scalaValue: Any = v; def typeName = "float"
  }
  final case class StrVal(v: String) extends Value {
    def scalaValue: Any = v; def typeName = "str"
  }

  final case class Cmp(column: String, op: String, value: Value) extends FilterAst
  final case class In(column: String, values: Seq[Value]) extends FilterAst
  final case class And(left: FilterAst, right: FilterAst) extends FilterAst
  final case class Or(left: FilterAst, right: FilterAst) extends FilterAst

  /** Column names referenced anywhere in the expression
    * (reference: _query_parser.py:118-144). */
  def referencedColumns(ast: FilterAst): Set[String] = ast match {
    case Cmp(c, _, _) => Set(c)
    case In(c, _)     => Set(c)
    case And(l, r)    => referencedColumns(l) ++ referencedColumns(r)
    case Or(l, r)     => referencedColumns(l) ++ referencedColumns(r)
  }
}

/** Raised on malformed filter syntax or semantic errors (mirrors the
  * reference's UnexpectedInput / ValueError). */
final class FilterParseException(msg: String) extends IllegalArgumentException(msg)

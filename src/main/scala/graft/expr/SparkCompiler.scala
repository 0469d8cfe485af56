package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a [[FilterAst]] into a Spark [[Column]].
  *
  * The resulting predicate is fully declarative (comparisons, `isin`, and/or
  * over `functions._`), so Catalyst pushes it into the Parquet scan
  * (`PushedFilters` in `.explain`) and keeps it inside whole-stage codegen —
  * the Spark analogue of the reference pushing `pc.Expression` into
  * `Dataset.scanner(filter=…)` (/root/reference/parq_tools/parq_filter.py:52-57).
  */
object SparkCompiler {

  def compile(ast: FilterAst): Column = ast match {
    case FilterAst.Cmp(c, op, v) =>
      val l = col(c)
      val r = lit(v.scalaValue)
      op match {
        case ">"  => l > r
        case "<"  => l < r
        case ">=" => l >= r
        case "<=" => l <= r
        case "==" => l === r
        case "!=" => l =!= r
        case other => throw new FilterParseException(s"Unexpected operator in filter query: $other")
      }
    case FilterAst.In(c, values) =>
      // Empty list is legal and matches nothing
      // (reference: test/filter/test_parser.py:120-125).
      if (values.isEmpty) lit(false)
      else col(c).isin(values.map(_.scalaValue): _*)
    case FilterAst.And(l, r) => compile(l) && compile(r)
    case FilterAst.Or(l, r)  => compile(l) || compile(r)
  }

  /** Parse + compile in one step. */
  def compile(expression: String): Column = compile(FilterParser.parse(expression))

  /** Validates that every column referenced by `expression` exists in the
    * frame; unknown columns raise with the full missing list (reference:
    * parq_concat.py:508-535). Returns the compiled predicate. */
  def compileValidated(expression: String, df: DataFrame): Column = {
    val ast = FilterParser.parse(expression)
    val missing = FilterAst.referencedColumns(ast).diff(df.columns.toSet)
    if (missing.nonEmpty)
      throw new FilterParseException(
        s"Filter references columns not present in the schema: ${missing.toSeq.sorted.mkString(", ")}")
    compile(ast)
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, classic}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions (Spark
  * 4.x moved these behind the Connect-compatible Column API). Needed to
  * expose custom Catalyst expressions as user-facing Columns.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a classic Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Fully CONVERT a Column's node tree to a Catalyst expression.
    * [[expression]] wraps API-built columns (e.g. `col("x").desc`) in a lazy
    * `ColumnNodeExpression` shell that pattern matches as nothing; this runs
    * the classic converter so the result is a real `SortOrder` /
    * `UnresolvedAttribute` tree that case matches work on. */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}

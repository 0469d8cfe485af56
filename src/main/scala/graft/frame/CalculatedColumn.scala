package graft.frame

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Derived columns: name + expression, dependencies inferred, placement rule
  * "insert after the last dependency" (SURVEY §2.2 P9; reference
  * /root/reference/parq_tools/calculated_columns.py:8-54, where deps come
  * from the Python function's parameter names — here from the expression's
  * column references).
  */
final case class CalculatedColumn(name: String, expression: String) {
  /** Columns among `available` (base + earlier calculated columns) that this
    * expression references. Identifier scan intersected with the known
    * columns: engine-agnostic and exact for the arithmetic/comparison
    * expressions this API accepts. */
  def dependencies(available: Seq[String]): Seq[String] = {
    val idents = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(expression).toSeq.distinct
    available.filter(idents.contains)
  }
}

object CalculatedColumn {

  /** Apply calculated columns, each placed immediately after its last
    * dependency in the column order (reference calculated_columns.py:26-32). */
  def apply(df: DataFrame, calcs: Seq[CalculatedColumn]): DataFrame = {
    val withCols = calcs.foldLeft(df)((d, c) => d.withColumn(c.name, expr(c.expression)))
    // `order.insert(last_dep + 1, name)` against the growing order, exactly
    // like the reference's _get_column_order.
    val order = calcs.foldLeft(df.columns.toVector) { (cols, c) =>
      val deps = c.dependencies(cols)
      val lastDep = deps.map(cols.indexOf).foldLeft(-1)(math.max)
      val insertAt = if (lastDep < 0) cols.size else lastDep + 1
      val (before, after) = cols.splitAt(insertAt)
      (before :+ c.name) ++ after
    }
    withCols.select(order.map(col): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OLAP reshaping: rollup subtotal reports and pivot (cross-tab) tables.
  * Thin, deliberately: Spark's native `rollup`/`cube`/`pivot` already plan
  * these optimally (rollup is one Expand + one partial-aggregated shuffle,
  * not one scan per grouping level; pivot is a single conditional
  * aggregation when the pivot values are supplied) — the operators add the
  * export discipline (deterministic labels instead of NULL group markers,
  * explicit pivot-value lists so the plan never needs a distinct-values
  * pre-job) that makes the results engine-comparable and safe at scale.
  */
object AggOps {

  /** Hierarchical subtotal report over `groupCols` (finest level, then
    * each prefix, then grand total). Rollup's NULL group markers are
    * replaced with `totalLabel` for flat export; a genuine NULL group
    * VALUE also renders as `totalLabel`, but the `grp` bitmask (0 =
    * detail row, bit i set = column i rolled up, all-bits = grand total)
    * still distinguishes the two — check `grp`, not the label. One
    * Expand + one shuffle regardless of the number of levels. */
  def rollupReport(df: DataFrame, groupCols: Seq[String],
      aggs: Seq[Column], totalLabel: String = "(all)"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(aggs.nonEmpty, "at least one aggregate required")
    // grouping_id is only valid INSIDE the rollup aggregation
    val withGrp = aggs :+ grouping_id(groupCols.map(col): _*).as("grp")
    val out = df.rollup(groupCols.map(col): _*)
      .agg(withGrp.head, withGrp.tail: _*)
    groupCols.foldLeft(out) { (d, c) =>
      d.withColumn(c, coalesce(col(c).cast("string"), lit(totalLabel)))
    }
  }

  /** Cross-tab: one row per `rowCol` value, one column per entry of
    * `pivotValues` holding `agg` over the matching slice. Explicit
    * `pivotValues` keeps this a SINGLE conditional aggregation (Spark
    * otherwise runs a distinct-values job first and the output schema
    * becomes data-dependent — both wrong for a 100 TB pipeline step). */
  def pivotTable(df: DataFrame, rowCol: String, pivotCol: String,
      pivotValues: Seq[String], agg: Column): DataFrame = {
    require(pivotValues.nonEmpty, "explicit pivot values required")
    df.groupBy(col(rowCol))
      .pivot(pivotCol, pivotValues)
      .agg(agg)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** One-row broadcast parameter frames for driver-sequenced iterative
  * fits (Newton/IRLS loops).
  *
  * Why: embedding the current iterate as LITERALS regenerates the
  * whole-stage-codegen source every pass, so every Newton step pays a
  * fresh Janino compile on top of its aggregation (measured as the
  * dominant cost of the survival/GLM shelf at bench scale — q401 spent
  * 22s of which <1s was the actual arithmetic). Routing the iterate
  * through a broadcast one-row frame keeps the plan source
  * iteration-invariant: the generated code references
  * AttributeReferences whose VALUES change per pass, so Janino's cache
  * compiles each pass shape exactly once per query.
  *
  * The arithmetic is value-identical: exp/multiply/divide see the same
  * doubles whether they arrive as a literal or a column, so decimal
  * Newton replays (the DuckDB oracle contract) are unaffected.
  *
  * Scale: the build side is a LocalRelation (no job to materialize) and
  * the join is a broadcast of one row — per-row cost on the stream side
  * is the same register read the literal would have been. */
private[graft] object ParamFrame {
  /** One-row frame with columns `pfx0 .. pfxN-1` holding `vals`. */
  def oneRow(spark: SparkSession, vals: Seq[Double], pfx: String): DataFrame = {
    val schema = StructType(vals.indices.map(i =>
      StructField(s"$pfx$i", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(vals)), schema)
  }

  /** `df` with the parameter row attached to every row (broadcast). */
  def attach(df: DataFrame, vals: Seq[Double], pfx: String): DataFrame =
    df.crossJoin(broadcast(oneRow(df.sparkSession, vals, pfx)))

  def p(pfx: String, i: Int): Column = col(s"$pfx$i")
}

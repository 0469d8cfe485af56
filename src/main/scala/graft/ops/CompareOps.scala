package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ParquetIO

/** Strict value-level comparison of two Parquet datasets (SURVEY §2.11 C1/C2;
  * reference /root/reference/parq_tools/parq_compare.py:28-92).
  *
  * The reference hashes raw Arrow buffers per batch — layout-dependent (a
  * rechunk or re-encode changes the hash without changing the data). We keep
  * the same result shape ([[CompareResult]] mirrors the dict at
  * parq_compare.py:30-38) but compare *semantically*: per shared column,
  * multiset equality via a two-sided `exceptAll` on (value) — distributed,
  * order-insensitive, scale-safe. Row-order-sensitive comparison would need a
  * row id; inputs to the reference's compare are required to be identically
  * ordered anyway.
  */
object CompareOps {

  final case class DtypeCompare(left: Option[String], right: Option[String], matches: Boolean)
  final case class MissingColumns(leftOnly: Seq[String], rightOnly: Seq[String])
  final case class CompareResult(
      metadata: Boolean,
      columns: Map[String, Boolean],
      columnsMatch: Boolean,
      missingColumns: MissingColumns,
      dtypes: Map[String, DtypeCompare],
      numRowsMatch: Boolean,
      numRowsLeft: Long,
      numRowsRight: Long) {
    def allEqual: Boolean =
      columnsMatch && numRowsMatch && columns.values.forall(identity)
  }

  def compareFiles(spark: SparkSession, left: String, right: String): CompareResult = {
    val metaEqual = {
      val l = ParquetIO.footer(spark, left).keyValueMetadata
      val r = ParquetIO.footer(spark, right).keyValueMetadata
      l == r
    }
    compare(ParquetIO.read(spark, left), ParquetIO.read(spark, right), metaEqual)
  }

  def compare(left: DataFrame, right: DataFrame, metadataEqual: Boolean = true): CompareResult = {
    val cols1 = left.columns.toSet
    val cols2 = right.columns.toSet
    val all = (cols1 ++ cols2).toSeq.sorted

    val dtypes = all.map { c =>
      val l = if (cols1(c)) Some(left.schema(c).dataType.simpleString) else None
      val r = if (cols2(c)) Some(right.schema(c).dataType.simpleString) else None
      c -> DtypeCompare(l, r, l.isDefined && l == r)
    }.toMap

    val nLeft = left.count()
    val nRight = right.count()

    val colEqual = all.map { c =>
      val eq =
        if (!cols1(c) || !cols2(c)) false
        else if (!dtypes(c).matches) false
        else if (nLeft != nRight) false
        else {
          // equal cardinalities: a ⊆ b (multiset) already implies equality,
          // so one exceptAll suffices — half the jobs of the two-sided check
          left.select(col(c)).exceptAll(right.select(col(c))).isEmpty
        }
      c -> eq
    }.toMap

    CompareResult(
      metadata = metadataEqual,
      columns = colEqual,
      columnsMatch = cols1 == cols2,
      missingColumns = MissingColumns(
        leftOnly = (cols1 -- cols2).toSeq.sorted,
        rightOnly = (cols2 -- cols1).toSeq.sorted),
      dtypes = dtypes,
      numRowsMatch = nLeft == nRight,
      numRowsLeft = nLeft,
      numRowsRight = nRight)
  }

  /** Row-level diff summary between two frames with the same schema: counts
    * of rows only-in-left, only-in-right, and in-both (multiset semantics).
    * One aggregation pass — no exceptAll double-scan. */
  def diffCounts(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.groupBy(left.columns.map(col): _*).agg(count(lit(1)).as("__l"))
    val rRenamed = right.columns.foldLeft(
      right.groupBy(right.columns.map(col): _*).agg(count(lit(1)).as("__r"))) {
      (df, c) => df.withColumnRenamed(c, s"__r_$c")
    }
    // null-safe equality: identical rows containing NULLs must match, not
    // count as only_in_left + only_in_right
    val cond = left.columns.map(c => l(c) <=> rRenamed(s"__r_$c")).reduce(_ && _)
    l.join(rRenamed, cond, "full_outer")
      .select(
        sum(greatest(coalesce(col("__l"), lit(0L)) - coalesce(col("__r"), lit(0L)), lit(0L))).as("only_in_left"),
        sum(greatest(coalesce(col("__r"), lit(0L)) - coalesce(col("__l"), lit(0L)), lit(0L))).as("only_in_right"),
        sum(least(coalesce(col("__l"), lit(0L)), coalesce(col("__r"), lit(0L)))).as("in_both"))
  }
}

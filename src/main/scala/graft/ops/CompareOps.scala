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

  def compareFiles(spark: SparkSession, left: String, right: String,
      exact: Boolean = false): CompareResult = {
    val metaEqual = {
      val l = ParquetIO.footer(spark, left).keyValueMetadata
      val r = ParquetIO.footer(spark, right).keyValueMetadata
      l == r
    }
    compare(ParquetIO.read(spark, left), ParquetIO.read(spark, right), metaEqual, exact)
  }

  /** Per shared same-type column, multiset equality of values.
    *
    * Default path (`exact = false`): ONE aggregation job per side computes an
    * order-insensitive fingerprint for every column at once — two
    * independently-mixed `xxhash64` sums plus a non-null count. A 200-column
    * table costs 2 scans instead of the 200 sequential `exceptAll` jobs
    * (~400 scans) of the exact path. Collision odds are ~2⁻¹²⁸ per column —
    * negligible for a diff report; pass `exact = true` for the `exceptAll`
    * proof when a hash collision is unacceptable. */
  def compare(left: DataFrame, right: DataFrame, metadataEqual: Boolean = true,
      exact: Boolean = false): CompareResult = {
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

    val comparable = all.filter(c => cols1(c) && cols2(c) && dtypes(c).matches)
    val valuesEqual: Map[String, Boolean] =
      if (nLeft != nRight || comparable.isEmpty) Map.empty
      else if (exact) comparable.map { c =>
        // equal cardinalities: a ⊆ b (multiset) already implies equality,
        // so one exceptAll suffices — half the jobs of the two-sided check
        c -> left.select(col(c)).exceptAll(right.select(col(c))).isEmpty
      }.toMap
      else {
        val lFp = fingerprintRow(left, comparable)
        val rFp = fingerprintRow(right, comparable)
        comparable.map(c => c -> (lFp(c) == rFp(c))).toMap
      }

    val colEqual = all.map { c =>
      c -> valuesEqual.getOrElse(c, false)
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

  /** One agg job: per column, (Σ xxhash64(v), Σ xxhash64(mix, v), #non-null).
    * Hash sums accumulate as decimal(38,0) — commutative (row order never
    * matters) and overflow-free below ~10¹⁹ rows even under ANSI mode. */
  private def fingerprintRow(df: DataFrame, cols: Seq[String]): Map[String, (BigDecimal, BigDecimal, Long)] = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(xxhash64(col(c)).cast(dec)).as(s"${c}__h1"),
        sum(xxhash64(lit("graft.fp"), col(c)).cast(dec)).as(s"${c}__h2"),
        count(col(c)).as(s"${c}__cnt"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def d(name: String): BigDecimal = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) BigDecimal(0) else BigDecimal(row.getDecimal(i))
    }
    cols.map { c =>
      val i = row.fieldIndex(s"${c}__cnt")
      c -> ((d(s"${c}__h1"), d(s"${c}__h2"), if (row.isNullAt(i)) 0L else row.getLong(i)))
    }.toMap
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

  /** Keyed snapshot diff: one row per key that differs between two dataset
    * versions, with `status` ∈ added / removed / changed (vs `old`→`new`)
    * and `changed_columns` (comma-joined, name-sorted; null for
    * added/removed). The dataset-versioning view [[diffCounts]] can't give:
    * WHICH keys moved, and in which columns. `includeUnchanged = true`
    * emits the identical keys too (status `unchanged`, empty
    * changed_columns).
    *
    * Compares the shared non-key columns whose types match on both sides
    * (null-safe `<=>`, so null→value and value→null count as changes);
    * one-sided or type-changed columns are reported by [[compare]]'s
    * schema diff, not here. Keys must be unique per side — duplicate keys
    * would cross-multiply in the join.
    *
    * Plan: one full-outer key join (the only shuffle, sort-merge at scale,
    * AQE-skew-splittable); presence flags and per-column comparisons are
    * pure projections. At 100 TB write both snapshots bucketed by key
    * ([[ScaleOps.writeBucketed]]) and the join goes shuffle-free. */
  def keyedDiff(old: DataFrame, newer: DataFrame, keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val missing = keys.filterNot(c => old.columns.contains(c) && newer.columns.contains(c))
    require(missing.isEmpty, s"key columns missing from a side: ${missing.mkString(", ")}")
    val shared = (old.columns.toSet intersect newer.columns.toSet)
      .diff(keys.toSet).toSeq.sorted
      .filter(c => old.schema(c).dataType == newer.schema(c).dataType)
    val lp = old.select(keys.map(col) ++ shared.map(c => col(c).as(s"__l_$c"))
      :+ lit(1).as("__lp"): _*)
    val rp = newer.select(keys.map(col) ++ shared.map(c => col(c).as(s"__r_$c"))
      :+ lit(1).as("__rp"): _*)
    val diffs = shared.map(c => !(col(s"__l_$c") <=> col(s"__r_$c")))
    val anyDiff = diffs.reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("__lp").isNull, "added")
      .when(col("__rp").isNull, "removed")
      .when(anyDiff, "changed").otherwise("unchanged")
    val changedCols = when(col("__lp").isNull || col("__rp").isNull,
        lit(null).cast("string"))
      .otherwise(concat_ws(",",
        shared.zip(diffs).map { case (c, d) => when(d, lit(c)) }: _*))
    lp.join(rp, keys, "full_outer")
      .select(keys.map(col) :+ status.as("status")
        :+ changedCols.as("changed_columns"): _*)
      .filter(if (includeUnchanged) lit(true) else col("status") =!= "unchanged")
  }
}

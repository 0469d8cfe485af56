package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation: constraint rules evaluated as
  * aggregates, plus referential-integrity checks — the contract gate a
  * pipeline runs before publishing a dataset version (the style of check
  * popularized by Deequ/Great Expectations, re-expressed as plain
  * aggregation plans).
  *
  * Scale shape: ALL row-level rules (not-null, range, set, regex) compile
  * into ONE aggregation pass over the data — one conditional-sum column
  * per rule, partial-aggregated, no per-rule scans. Each uniqueness rule
  * needs its own groupBy (duplicate detection is inherently a shuffle on
  * the checked key); its result joins the report as one extra small job.
  * Referential integrity is a broadcast-or-shuffle anti-join counted,
  * never materializing the orphan rows unless asked.
  */
object QualityOps {

  /** A validation rule; `test` is the per-row PASS predicate and null
    * handling is explicit per rule type. */
  sealed trait Rule {
    def name: String
    def columnName: String
  }
  /** Fails on SQL NULL. */
  case class NotNull(columnName: String) extends Rule {
    val name = s"not_null($columnName)"
  }
  /** Fails when the value falls outside [lo, hi]; NULLs fail too (use
    * [[NotNull]] semantics — a range check on nothing is a failure). */
  case class InRange(columnName: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($columnName,$lo,$hi)"
  }
  /** Fails when the value is not in the allowed set; NULLs fail. */
  case class InSet(columnName: String, allowed: Seq[String]) extends Rule {
    val name = s"in_set($columnName)"
  }
  /** Fails when the value does not fully match `regex`; NULLs fail. */
  case class Matches(columnName: String, regex: String) extends Rule {
    val name = s"matches($columnName)"
  }
  /** Fails for every row beyond the first occurrence of a key (duplicate
    * count = n_rows − n_distinct_keys). Needs its own groupBy job. */
  case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
    val columnName: String = columns.mkString(",")
  }

  private def passExpr(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNotNull
    case InRange(c, lo, hi) =>
      // cast-then-null-check: a NULL *or an uncastable value* both fail
      // (col.isNotNull && between would let garbage strings pass as NULL)
      col(c).cast("double").isNotNull && col(c).cast("double").between(lo, hi)
    case InSet(c, allowed) => col(c).isNotNull && col(c).isin(allowed: _*)
    case Matches(c, re) => col(c).isNotNull && col(c).rlike(re)
    case _: Unique => lit(true) // handled by its own aggregation
  }

  /** Evaluate `rules` against `df`: one report row per rule with
    * `(rule, column, n_rows, violations, violation_rate, pass)` where
    * `pass` is 1 iff violations == 0. Row-level rules share a single
    * aggregation pass; each [[Unique]] adds one distinct-count job. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val rowRules = rules.filter(!_.isInstanceOf[Unique])
    val uniqueRules = rules.collect { case u: Unique => u }

    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    val reportSchema = StructType(Seq(
      StructField("rule", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("violations", LongType, nullable = false)))

    val rowPart: Option[DataFrame] = if (rowRules.isEmpty) None else {
      val aggs = count(lit(1)).as("_n") +:
        rowRules.zipWithIndex.map { case (r, i) =>
          sum(when(!passExpr(r), 1L).otherwise(0L)).as(s"_v$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // reshape the single wide row to long form in-plan (no driver data)
      val entries = rowRules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), lit(r.columnName).as("column_name"),
          col("_n").as("n_rows"), coalesce(col(s"_v$i"), lit(0L)).as("violations"))
      }
      Some(one.select(explode(array(entries: _*)).as("e")).select(col("e.*")))
    }
    val uniqueParts: Seq[DataFrame] = uniqueRules.map { u =>
      df.groupBy(u.columns.map(col): _*).agg(count(lit(1)).as("_c"))
        .agg(coalesce(sum("_c"), lit(0L)).as("n_rows"),
          coalesce(sum(col("_c") - 1), lit(0L)).as("violations"))
        .select(lit(u.name).as("rule"), lit(u.columnName).as("column_name"),
          col("n_rows"), col("violations"))
    }
    val all = (rowPart.toSeq ++ uniqueParts)
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], reportSchema))
    all.select(col("rule"), col("column_name"), col("n_rows"), col("violations"),
      round(col("violations").cast("double") / col("n_rows"), 6).as("violation_rate"),
      when(col("violations") === 0, 1).otherwise(0).as("pass"))
  }

  /** Referential-integrity summary: how many `fact` rows reference a key
    * absent from `dim`. One anti-join (broadcast when dim's distinct keys
    * are small, AQE decides) + counts; orphan ROWS are only materialized
    * by [[orphanRows]]. NULL fact keys are counted separately (they
    * reference nothing, which is its own data-quality signal). */
  def referentialIntegrity(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val nonNull = fact.filter(col(factKey).isNotNull)
    val orphans = nonNull.join(
      dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_anti")
    val counts = fact.agg(
      count(lit(1)).as("n_fact"),
      coalesce(sum(when(col(factKey).isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_keys"))
    counts.crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
      .select(col("n_fact"), col("n_null_keys"), col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_fact"), 6).as("orphan_rate"))
  }

  /** The orphan rows themselves (for debugging a failed check). */
  def orphanRows(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    fact.filter(col(factKey).isNotNull).join(
      dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_anti")

  /** k-anonymity report over quasi-identifier columns — the governance
    * check a training-data release runs before shipping: every row must
    * share its quasi-identifier combination (its equivalence class) with
    * at least `k−1` others, or it is re-identifiable. One row out:
    * `(n_rows, n_classes, k_anonymity, n_classes_below_k,
    * n_rows_at_risk, risk_share, pass)` where `k_anonymity` is the
    * dataset's ACTUAL minimum class size (its achieved k) and `pass`
    * means `k_anonymity >= k`. NULL quasi-values form their own classes
    * (a null birthdate is itself an identifying pattern).
    *
    * Scale: one partial-aggregated groupBy on the quasi columns → class
    * counts (quasi-cardinality-sized, never row-sized), then one scalar
    * reduce. Same budget as an exact distinct over the same columns. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 1, s"k must be >= 1: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__n")).cast("long").as("k_anonymity"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).cast("long")
          .as("n_classes_below_k"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).cast("long")
          .as("n_rows_at_risk"))
      .withColumn("risk_share",
        round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6))
      .withColumn("pass", col("k_anonymity") >= k)
  }
}

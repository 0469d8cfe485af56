package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association statistics between two categorical columns — the
  * feature/label dependence report a training-data team reads before
  * trusting a column split: a high lang×source association means
  * per-source sampling silently reweights languages; a high
  * feature×label association on a supposedly-neutral column flags
  * leakage. (Capability extension beyond the reference surface — the
  * reference's profiler stops at per-column stats,
  * /root/reference/parq_tools/profile/columns.py; cross-column
  * association is the natural next stat a 100 TB corpus needs.)
  *
  * One row out: `(n, k_a, k_b, chi2, cramers_v, mutual_info)` —
  * Pearson's χ², Cramér's V (χ² normalized to [0,1] by
  * `n·(min(kₐ,k_b)−1)`; NULL when either column is constant) and mutual
  * information in nats (natural log, MLE plug-in estimate).
  *
  * Scale: ONE wide shuffle — the `(a,b)` contingency aggregation, whose
  * partial aggregation collapses each partition to ≤ kₐ·k_b cells before
  * the exchange, so shuffle volume is cell-bounded, never row-bounded.
  * Marginals and totals reduce from the cell table (tiny), and the final
  * statistics are one aggregation over cells. The marginal/total
  * derivations repeat the cells subtree in the logical plan; at
  * execution AQE's exchange reuse computes the corpus-sized exchange
  * ONCE and the repeats read it back (PlanSpec pins the `ReusedExchange`
  * nodes), so the corpus is scanned and aggregated a single time. Empty cells never
  * materialize: Σ over ALL kₐ·k_b cells of the χ² term is computed as
  * Σ_observed (o−e)²/e + (n − Σ_observed e), exact because an empty
  * cell's term is (0−e)²/e = e and Σ_all e = n. Empty cells contribute
  * 0 to MI by convention (lim p→0 of p·ln p).
  */
object Association {

  def categoricalAssociation(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df
      .filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).as("va"), col(b).as("vb"))
      .agg(count(lit(1)).cast("double").as("o"))
    val ma = cells.groupBy(col("va")).agg(sum(col("o")).as("ca"))
    val mb = cells.groupBy(col("vb")).agg(sum(col("o")).as("cb"))
    val totals = cells.agg(
      sum(col("o")).as("n"),
      count_distinct(col("va")).as("k_a"),
      count_distinct(col("vb")).as("k_b"))
    val e = col("ca") * col("cb") / col("n") // expected count under independence
    val joined = cells
      .join(broadcast(ma), "va")
      .join(broadcast(mb), "vb")
      .crossJoin(broadcast(totals))
    joined.agg(
      first(col("n")).cast("long").as("n"),
      first(col("k_a")).as("k_a"),
      first(col("k_b")).as("k_b"),
      // observed-cell terms + the empty-cell mass (n − Σ_observed e);
      // clamped at 0: on near-independent data the closed-form empty mass
      // carries first-order float rounding (±cells·ulp(n)) that can land
      // a mathematically-zero χ² at −1e-12, which sqrt would turn into
      // NaN (and an error in a DuckDB replay)
      greatest(sum(pow(col("o") - e, 2) / e) +
        first(col("n")) - sum(e), lit(0.0)).as("chi2"),
      sum(col("o") / col("n") *
        log(col("o") * col("n") / (col("ca") * col("cb")))).as("mutual_info"))
      .withColumn("cramers_v",
        when(least(col("k_a"), col("k_b")) > 1,
          sqrt(col("chi2") / (col("n") * (least(col("k_a"), col("k_b")) - 1)))))
      .select(col("n"), col("k_a"), col("k_b"), col("chi2"),
        col("cramers_v"), col("mutual_info"))
  }

  /** All-pairs association matrix over `cols` — the leakage scan a
    * labeled dataset runs before training: every unordered column pair's
    * `(n, k_a, k_b, chi2, cramers_v, mutual_info)` row, `col_a`/`col_b`
    * in `cols` order (the categorical analogue of a correlation matrix).
    *
    * Scale: one [[categoricalAssociation]] plan per pair, unioned —
    * pair count is k·(k−1)/2 over the HANDFUL of columns worth scanning,
    * each a 2-column pruned scan into a cell-bounded aggregation, and
    * the independent sub-plans schedule concurrently. */
  def associationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    pairs.map { case (a, b) =>
      categoricalAssociation(df, a, b)
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"), col("k_a"),
          col("k_b"), col("chi2"), col("cramers_v"), col("mutual_info"))
    }.reduce(_ unionByName _)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * rank-scaled columns into ONE sort key so that sorting by it co-locates
  * rows that are close in EVERY keyed dimension at once. The point at
  * 100 TB: parquet row-group pruning works off per-group min/max ranges,
  * and a single-column sort gives perfect pruning on that column but
  * full-range groups on every other — a Z-order sort shrinks ALL keyed
  * columns' per-group ranges simultaneously, so multi-dimensional range
  * scans (`user BETWEEN … AND value BETWEEN …`) skip most groups. The
  * same layout lever as Delta Lake's OPTIMIZE ZORDER BY, built here from
  * plain Spark primitives: a fixed-point cell id per column, a codegen'd
  * bit-interleave projection, `repartitionByRange` + in-partition sort.
  *
  * Everything is engine-replayable: cell ids use exact integer arithmetic
  * against driver-collected [min, max] literals (one tiny agg job) and the
  * interleave is a `shift/and/or` expression tree with an SQL mirror
  * generated from the same definition ([[mortonSql]]), so an external
  * engine reproduces keys bit-for-bit. */
object ZOrder {

  /** Bit-interleaved Morton key over per-column CELL ids (each already in
    * `[0, 2^bits)`): bit `i` of cell `j` lands at output bit `i*k + j`.
    * Pure projection — `bits × k` shift/mask/or terms, all codegen'd;
    * `bits * k` must fit a signed long. */
  def mortonKey(cells: Seq[Column], bits: Int): Column = {
    require(cells.nonEmpty, "at least one cell column required")
    require(bits >= 1 && bits * cells.size <= 62,
      s"bits ($bits) x columns (${cells.size}) must fit a signed long")
    val k = cells.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cells.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** SQL mirror of [[mortonKey]] — generated from the same (i, j) → bit
    * mapping so the Spark key and an external engine's replay cannot
    * drift. `cellSqls` are SQL expressions already in `[0, 2^bits)`. */
  def mortonSql(cellSqls: Seq[String], bits: Int): String = {
    require(cellSqls.nonEmpty && bits >= 1 && bits * cellSqls.size <= 62)
    val k = cellSqls.size
    (for {
      i <- 0 until bits
      (c, j) <- cellSqls.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * k + j})").mkString(" | ")
  }

  /** Fixed-point cell id in `[0, 2^bits)` for a value against literal
    * bounds: `floor((v − lo) · (2^bits − 1) / (hi − lo))`, null → 0.
    * Exactness: numerator and denominator are integers ≤ ~2^45 — both
    * represent exactly in double, the true quotient sits ≥ 1/(hi−lo)
    * away from any other integer, and one correctly-rounded IEEE divide
    * cannot bridge that gap at these magnitudes — so `floor` lands on
    * the same cell in every IEEE-754 engine. */
  def fixedPointCell(v: Column, lo: Long, hi: Long, bits: Int): Column =
    if (hi <= lo) lit(0L)
    else least(greatest(
      floor((coalesce(v.cast("long"), lit(lo)) - lit(lo)).cast("double") *
        ((1L << bits) - 1) / (hi - lo).toDouble).cast("long"),
      lit(0L)), lit((1L << bits) - 1))

  /** SQL mirror of [[fixedPointCell]] (same arithmetic, same clamps). */
  def fixedPointCellSql(vSql: String, lo: Long, hi: Long, bits: Int): String =
    if (hi <= lo) "0"
    else s"least(greatest(CAST(floor(CAST(coalesce($vSql, $lo) - ($lo) AS DOUBLE) * " +
      s"${(1L << bits) - 1} / ${(hi - lo).toDouble}) AS BIGINT), 0), ${(1L << bits) - 1})"

  /** [[fixedPointCellSql]] with the bounds as SQL EXPRESSIONS (scalar
    * subquery/CTE columns) instead of literals — for oracles that must
    * recompute the bounds from the same table at replay time. Assumes a
    * non-degenerate range (the literal form folds `hi <= lo` statically). */
  def fixedPointCellSqlDyn(vSql: String, loSql: String, hiSql: String,
      bits: Int): String =
    s"least(greatest(CAST(floor(CAST(coalesce($vSql, $loSql) - ($loSql) AS DOUBLE) * " +
      s"${(1L << bits) - 1} / CAST(($hiSql) - ($loSql) AS DOUBLE)) AS BIGINT), 0), " +
      s"${(1L << bits) - 1})"

  /** Driver-collected [min, max] per key column — ONE tiny aggregation job
    * over the (column-pruned) key columns; the bounds become literals in
    * the cell expressions, so key assignment is a pure deterministic
    * function of the row (the [[ScaleOps.rangeBucketExpr]] recompute-safety
    * argument applies: re-evaluation after block loss reassigns
    * identically). */
  def keyBounds(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    require(cols.nonEmpty, "at least one key column required")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__lo_$c"), max(col(c).cast("long")).as(s"__hi_$c")))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(2 * i)) (0L, 0L) // all-null column
      else (row.getLong(2 * i), row.getLong(2 * i + 1))
    }
  }

  /** Attach the Morton key of `cols` as `outCol` (bounds collected via
    * [[keyBounds]] unless supplied). A pure scan-stage projection. */
  def withMortonKey(df: DataFrame, cols: Seq[String], outCol: String,
      bits: Int = 16, bounds: Option[Seq[(Long, Long)]] = None): DataFrame = {
    val bs = bounds.getOrElse(keyBounds(df, cols))
    require(bs.size == cols.size, s"need one (lo,hi) per column: $bs")
    val cells = cols.zip(bs).map { case (c, (lo, hi)) =>
      fixedPointCell(col(c), lo, hi, bits) }
    df.withColumn(outCol, mortonKey(cells, bits))
  }

  /** Rewrite `df` at `path` in Z-order on `cols`: key every row
    * ([[withMortonKey]]), range-partition on the key into `numFiles`
    * output partitions and sort each partition by it, then drop the key.
    * Row content is untouched — only the ORDER (and therefore every
    * file's and row-group's per-column min/max ranges) changes. The range
    * partitioning uses Spark's sampled splits — fine here, the key is
    * only a layout hint; correctness never depends on which partition a
    * row lands in. */
  def zOrderWrite(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int = 0, bits: Int = 16): Unit = {
    require(cols.size >= 2,
      "z-order needs >= 2 columns (one column wants a plain sort)")
    val n = if (numFiles > 0) numFiles
      else math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    withMortonKey(df, cols, "__z", bits)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles at corpus scale — the histogram-guided
  * order-statistic algorithm (the classic two-phase "approximate then
  * resolve" refinement; see e.g. the iterative histogram narrowing in
  * public massive-parallel quantile literature):
  *
  *  1. ONE aggregation scan: per-column min / max / non-null count.
  *  2. ONE bin-count pass: every value maps to a fixed-width bin index
  *     (`bins` cells between min and max); counts collect to the driver
  *     (`bins × |columns|` longs — bounded, never row data).
  *  3. The driver locates each target rank's bin; ONE more pass collects
  *     the DISTINCT values (+counts) of just those bins — expected
  *     `distinct/bins` values each — and the exact bracketing order
  *     statistics come from a driver-side cumsum. If a located bin still
  *     holds more than `capRows` rows (heavy skew), it is re-binned
  *     WITHIN its range — expression-composed, so no floating-point
  *     boundary drift between passes — until it fits or cannot subdivide
  *     further (a run of near-identical doubles: its distinct set is tiny
  *     by construction, so the collect is safe regardless of row count).
  *
  * vs the `percentile` aggregate: that buffer holds EVERY distinct value
  * and merges into ONE final task — measured 2.3-2.8 s on 583k distinct
  * doubles at sf0.1 and an OOM at corpus scale. Here every pass is a
  * codegen'd scan with a map-side-combined tiny aggregation; driver and
  * collect sizes are bounded by `bins` and the located bins' distinct
  * counts, independent of corpus size.
  *
  * Semantics: Spark `percentile` interpolation — the weighted form
  * `(⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi` at `pos = p·(n−1)` on the exact
  * order statistics, the identical double expression, so results are
  * bit-for-bit what `percentile` returns on NaN-free data. Nulls are
  * ignored; NaN is EXCLUDED like null (the `percentile` aggregate's NaN
  * behavior is undefined hash-map ordering — we document the clean
  * contract instead). ±Infinity is a first-class input: infinities are
  * counted out in pass 1 and resolve their extreme ranks directly (they
  * cannot bin), finite ranks shift past the −∞ block, and segments whose
  * lo/hi span overflows double (hi − lo = ∞) narrow by midpoint bisection
  * until fixed-width binning is meaningful again. */
object ExactQuantiles {

  /** Per-column exact quantiles; one Option per p (None when the column
    * has no non-null, non-NaN values). All columns share the same passes —
    * profiling several columns costs the same scans as one. Columns whose
    * row count is ≤ `smallRows` skip the bin-count pass entirely and go
    * straight to the distinct-collect (two jobs total — the bin pass only
    * pays for itself when the distinct set is too big to collect). */
  def quantiles(df: DataFrame, columns: Seq[String], ps: Seq[Double],
      bins: Int = 8192, capRows: Long = 4000000L,
      maxRefine: Int = 16, smallRows: Long = 262144L): Map[String, Seq[Option[Double]]] = {
    require(columns.nonEmpty, "at least one column required")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    require(bins >= 2, s"bins must be >= 2: $bins")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Columns not in frame: ${missing.mkString(", ")}")

    def clean(c: String): Column = {
      val v = col(c).cast("double")
      when(!isnan(v), v) // null for both SQL null and NaN
    }
    // ±Infinity is a legal input (the profiler counts nInfinite) but can
    // never live inside a fixed-width bin grid: (v−lo)/(hi−lo) with an
    // infinite span maps everything to bin 0 and the whole column would
    // silently fall through to a full distinct-collect. Infinities are
    // split out in pass 1 instead: they occupy the extreme ranks by
    // definition (−∞ the first `nNeg`, +∞ the last `nPos`), so those
    // ranks resolve WITHOUT scanning and the bin machinery runs on the
    // finite values only, with rank offsets.
    def cleanFinite(c: String): Column = {
      val v = clean(c)
      when(v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity, v)
    }

    // ---- pass 1: finite min / max, counts (finite, ±inf) per column -----
    val statAggs = columns.flatMap { c =>
      Seq(min(cleanFinite(c)).as(s"__mn_$c"), max(cleanFinite(c)).as(s"__mx_$c"),
        count(cleanFinite(c)).as(s"__n_$c"),
        sum(when(clean(c) === Double.NegativeInfinity, 1L).otherwise(0L))
          .as(s"__ni_$c"),
        sum(when(clean(c) === Double.PositiveInfinity, 1L).otherwise(0L))
          .as(s"__pi_$c"))
    }
    val statRow = df.agg(statAggs.head, statAggs.tail: _*).head()
    // mn/mx are over FINITE values (NaN when none); n includes infinities
    case class Stats(mn: Double, mx: Double, n: Long, nNeg: Long, nFin: Long)
    val stats: Map[String, Option[Stats]] = columns.map { c =>
      val nFin = statRow.getAs[Long](s"__n_$c")
      val nNeg = Option(statRow.getAs[Long](s"__ni_$c")).getOrElse(0L)
      val nPos = Option(statRow.getAs[Long](s"__pi_$c")).getOrElse(0L)
      val n = nFin + nNeg + nPos
      c -> (if (n == 0) None
            else Some(Stats(
              if (nFin == 0) Double.NaN else statRow.getAs[Double](s"__mn_$c"),
              if (nFin == 0) Double.NaN else statRow.getAs[Double](s"__mx_$c"),
              n, nNeg, nFin)))
    }.toMap

    // target 0-based ranks per column (the floor/ceil bracketing pair)
    def positions(n: Long): Seq[Double] = ps.map(p => p * (n - 1))
    def neededRanks(n: Long): Seq[Long] =
      positions(n).flatMap(pos =>
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct

    // a segment = one column's value sub-range still being narrowed:
    // `pred` composes the EXACT bin expressions that selected it, so the
    // filter in later passes can never disagree with earlier binning
    case class Seg(colIdx: Int, pred: Column, lo: Double, hi: Double,
      cumBefore: Long, rows: Long, ranks: Seq[Long])

    // A FINITE lo/hi pair can still have a non-finite span (values near
    // ±1.7e308: hi − lo overflows to Infinity) — fixed-width binning
    // degenerates there ((v−lo)/∞ = 0 for every value), so such segments
    // split by MIDPOINT BISECTION instead: lo/2 + hi/2 is always finite
    // and strictly between them, and 2-way splits converge the span back
    // into finite-width territory in ≤ 2 rounds.
    def finiteWidth(lo: Double, hi: Double): Boolean =
      java.lang.Double.isFinite(hi - lo)
    def midpoint(lo: Double, hi: Double): Double = lo / 2 + hi / 2
    def binExpr(c: String, lo: Double, hi: Double): Column = {
      val v = clean(c)
      if (finiteWidth(lo, hi))
        least(lit(bins - 1), greatest(lit(0),
          floor((v - lit(lo)) / (lit(hi) - lit(lo)) * lit(bins)))).cast("int")
      else
        when(v < lit(midpoint(lo, hi)), 0).otherwise(1).cast("int")
    }
    def nBins(lo: Double, hi: Double): Int = if (finiteWidth(lo, hi)) bins else 2
    // can this range still subdivide in double space?
    def splittable(lo: Double, hi: Double): Boolean =
      if (!finiteWidth(lo, hi)) { val m = midpoint(lo, hi); lo < m && m < hi }
      else hi > lo && (lo + (hi - lo) / bins) > lo

    // one bin-count pass over a set of segments → child segments
    def refine(segs: Seq[Seg]): Seq[Seg] = {
      if (segs.isEmpty) return Nil
      val entries = segs.zipWithIndex.map { case (s, i) =>
        val c = columns(s.colIdx)
        struct(lit(i).as("seg"),
          when(s.pred, binExpr(c, s.lo, s.hi)).as("bin"))
      }
      val counts = df.select(explode(array(entries: _*)).as("e"))
        .filter(col("e.bin").isNotNull)
        .groupBy(col("e.seg").as("seg"), col("e.bin").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
      segs.zipWithIndex.flatMap { case (s, i) =>
        val byBin = counts.getOrElse(i, Array.empty[(Int, Int, Long)])
          .map(t => (t._2, t._3)).sortBy(_._1)
        var cum = s.cumBefore
        val width = s.hi - s.lo
        val nb = nBins(s.lo, s.hi)
        byBin.flatMap { case (b, cnt) =>
          val childRanks = s.ranks.filter(k => cum <= k && k < cum + cnt)
          val out = if (childRanks.isEmpty) None
          else {
            val c = columns(s.colIdx)
            val (childLo, childHi) =
              if (finiteWidth(s.lo, s.hi))
                (s.lo + width * b / bins,
                  if (b == bins - 1) s.hi else s.lo + width * (b + 1) / bins)
              else if (b == 0) (s.lo, midpoint(s.lo, s.hi))
              else (midpoint(s.lo, s.hi), s.hi)
            require(b < nb, s"bin $b out of range for $nb-way split")
            Some(Seg(s.colIdx, s.pred && binExpr(c, s.lo, s.hi) === b,
              childLo, childHi, cum, cnt, childRanks))
          }
          cum += cnt
          out
        }
      }
    }

    // ranks below nNeg / at-or-above nNeg+nFin are infinities by
    // definition — resolved up front, no scan; only FINITE-range ranks
    // enter the segment machinery (offset by the −∞ block)
    val infResolved: Map[(Int, Long), Double] =
      columns.zipWithIndex.flatMap { case (c, i) =>
        stats(c).toSeq.flatMap { st =>
          neededRanks(st.n).flatMap { k =>
            if (k < st.nNeg) Some((i, k) -> Double.NegativeInfinity)
            else if (k >= st.nNeg + st.nFin) Some((i, k) -> Double.PositiveInfinity)
            else if (st.nFin > 0 && st.mx == st.mn) Some((i, k) -> st.mn)
            else None // finite, non-constant: segments resolve it
          }
        }
      }.toMap

    // ---- passes 2..k: narrow until every needed segment fits ------------
    val initial = columns.zipWithIndex.flatMap { case (c, i) =>
      stats(c) match {
        case Some(st) if st.nFin > 0 && st.mx > st.mn =>
          val finiteRanks = neededRanks(st.n)
            .filter(k => k >= st.nNeg && k < st.nNeg + st.nFin)
          if (finiteRanks.isEmpty) None
          else Some(Seg(i, cleanFinite(c).isNotNull, st.mn, st.mx,
            st.nNeg, st.nFin, finiteRanks))
        case _ => None // empty, all-∞ or constant column: no scans needed
      }
    }
    // small columns go straight to the distinct-collect — no bin pass
    val (smallInit, largeInit) = initial.partition(_.rows <= smallRows)
    var pending = smallInit ++ refine(largeInit)
    var round = 0
    while (pending.exists(s => s.rows > capRows && splittable(s.lo, s.hi))
        && round < maxRefine) {
      val (hot, ok) = pending.partition(s =>
        s.rows > capRows && splittable(s.lo, s.hi))
      pending = ok ++ refine(hot)
      round += 1
    }

    // ---- final pass: distinct values of the located segments ------------
    val resolved: Map[(Int, Long), Double] =
      if (pending.isEmpty) Map.empty
      else {
        val entries = pending.zipWithIndex.map { case (s, i) =>
          struct(lit(i).as("seg"),
            when(s.pred, clean(columns(s.colIdx))).as("v"))
        }
        val vals = df.select(explode(array(entries: _*)).as("e"))
          .filter(col("e.v").isNotNull)
          .groupBy(col("e.seg").as("seg"), col("e.v").as("v"))
          .agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
          .groupBy(_._1)
        pending.zipWithIndex.flatMap { case (s, i) =>
          val sorted = vals.getOrElse(i, Array.empty[(Int, Double, Long)])
            .map(t => (t._2, t._3)).sortBy(_._1)
          var cum = s.cumBefore
          sorted.flatMap { case (v, cnt) =>
            val hit = s.ranks.filter(k => cum <= k && k < cum + cnt)
              .map(k => (s.colIdx, k) -> v)
            cum += cnt
            hit
          }
        }.toMap
      }

    assemble(columns,
      stats.map { case (c, s) =>
        c -> s.map(st => (st.n, st.nNeg, st.nFin,
          if (st.nFin > 0 && st.mx == st.mn) Some(st.mn) else None))
      },
      infResolved ++ resolved, ps)
  }

  /** The sorted distinct (value, count) table of a small column — Some
    * only when the collect is GUARANTEED to fit: the row count (a cheap
    * scan-only job, and an upper bound on the distinct count) must be ≤
    * `maxRows` BEFORE the grouped shuffle runs, so a high-cardinality
    * corpus-scale column costs one count and no wasted shuffle on the way
    * to the scalable [[quantiles]] passes. The limit on the collect is a
    * belt-and-suspenders bound, never exercised when the guard holds.
    * Lets derived-statistic callers (e.g. MAD: the median of
    * |v − median|) compute SEVERAL exact order statistics from ONE
    * collect via [[quantilesFromCounts]] instead of paying the passes per
    * statistic. */
  def distinctCounts(df: DataFrame, column: String,
      maxRows: Long = 262144L): Option[Seq[(Double, Long)]] = {
    val v = col(column).cast("double")
    val cleanV = when(!isnan(v), v)
    val cleaned = df.select(cleanV.as("__v")).filter(col("__v").isNotNull)
    if (cleaned.count() > maxRows) return None
    val rows = cleaned
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .limit(math.min(maxRows, Int.MaxValue - 1L).toInt + 1)
      .collect()
    Some(rows.map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  /** Exact interpolated quantiles over a sorted distinct (value, count)
    * table — Spark `percentile`'s weighted interpolation, driver-side.
    * Empty input → all None. */
  def quantilesFromCounts(sorted: Seq[(Double, Long)],
      ps: Seq[Double]): Seq[Option[Double]] = {
    val n = sorted.map(_._2).sum
    if (n == 0) return ps.map(_ => None)
    def valueAt(k: Long): Double = {
      var cum = 0L
      val it = sorted.iterator
      while (it.hasNext) {
        val (v, c) = it.next()
        if (cum <= k && k < cum + c) return v
        cum += c
      }
      throw new IllegalStateException(s"rank $k not found")
    }
    ps.map { p =>
      val pos = p * (n - 1)
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val vLo = valueAt(lo)
      Some(if (lo == hi) vLo else (hi - pos) * vLo + (pos - lo) * valueAt(hi))
    }
  }

  private def assemble(columns: Seq[String],
      // per column: (n, nNeg, nFin, constant finite value if mx == mn)
      info: Map[String, Option[(Long, Long, Long, Option[Double])]],
      resolved: Map[(Int, Long), Double],
      ps: Seq[Double]): Map[String, Seq[Option[Double]]] = {
    // ---- assemble + interpolate (Spark percentile's exact formula) ------
    // every needed rank — finite, ±∞ block, or constant shortcut — is in
    // `resolved` by construction; interpolation across an infinite
    // endpoint follows IEEE through the same expression the aggregate
    // evaluates (−∞ bracket → −∞, mixed ∓∞ brackets → NaN)
    columns.zipWithIndex.map { case (c, i) =>
      c -> (info(c) match {
        case None => ps.map(_ => Option.empty[Double])
        case Some((n, nNeg, nFin, const)) =>
          ps.map { p =>
            val pos = p * (n - 1)
            val lo = math.floor(pos).toLong
            val hi = math.ceil(pos).toLong
            // constant finite range with both brackets inside it: the
            // EXACT value, no weighted round-trip ((1−w)·v + w·v loses an
            // ulp — the pre-existing constant-column contract)
            if (const.isDefined && lo >= nNeg && hi < nNeg + nFin) const
            else {
              val vLo = resolved((i, lo))
              // Spark Percentile's exact expression — the WEIGHTED-average
              // form `(hi−pos)·vLo + (pos−lo)·vHi`, which differs from
              // `vLo + Δ·frac` by an ulp on some inputs; bit-parity with
              // the aggregate (and the DuckDB oracle) requires this one
              Some(if (lo == hi) vLo
                   else (hi - pos) * vLo + (pos - lo) * resolved((i, hi)))
            }
          }
      })
    }.toMap
  }
}

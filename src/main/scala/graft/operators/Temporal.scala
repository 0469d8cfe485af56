package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal / ordered-join operators for event and time-series data
  * (north-star extensions — the reference has no temporal surface; these are
  * the joins an event-log or feature-engineering pipeline needs that Spark
  * has no built-in operator for).
  *
  * Design rules:
  *  - [[asofJoin]] is the union-of-sides + running-`last` formulation: ONE
  *    hash shuffle on the join keys, one sort, one window pass. The naive
  *    formulation (inequality join + row_number) is quadratic in per-key
  *    right-side density and plans as a BroadcastNestedLoopJoin when the
  *    equality keys are absent; this one is linear and scales with the key
  *    cardinality like any groupBy.
  *  - [[rangeJoin]] rewrites point-in-interval containment as an EQUI-join
  *    on a bucket id. Spark plans a bare `p BETWEEN s AND e` predicate as
  *    BroadcastNestedLoopJoin (all pairs); bucketization makes it a
  *    SortMergeJoin/ShuffledHashJoin whose cost is candidate pairs per
  *    bucket, tunable via `bucketWidth`.
  */
object Temporal {

  private val SideCol = "__asof_side"
  private val TsCol = "__asof_ts"
  private val PayloadCol = "__asof_payload"

  /** Backward as-of join: for each left row, the single most recent right
    * row of the same key with `right.ts <= left.ts` (inclusive), or nulls if
    * none (left-outer semantics). `direction = "forward"` flips to the
    * earliest right row with `right.ts >= left.ts`.
    *
    * `right` must carry exactly `keyCols :+ rightTs` plus the payload
    * columns to attach; payload names must not collide with left columns.
    * All payload fields come from one physical right row (they ride in a
    * single struct), so a legitimately-null payload value can never be
    * "torn" and filled from an older row.
    *
    * Ties: right rows sharing (key, ts) are broken by `rightTieBreak`
    * (largest wins for backward, smallest for forward); pass a unique
    * column (an event id) to make the join deterministic.
    *
    * `toleranceUs` bounds the match distance in microseconds: a match
    * farther than the tolerance yields nulls, like a missed join.
    *
    * Plan shape: Exchange(hashpartitioning(keyCols)) → Sort → Window →
    * Filter. No join operator at all — the "join" is a running `last` over
    * the interleaved sides, so cost is one shuffle of left+right and a
    * per-key sort, independent of match density. */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      direction: String = "backward",
      rightTieBreak: Option[String] = None,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs).toSeq
    require(payloadCols.nonEmpty, "right side has no payload columns to attach")
    val collide = payloadCols.filter(left.columns.contains)
    require(collide.isEmpty, s"payload columns collide with left: ${collide.mkString(",")}")

    // matched right ts rides inside the struct so tolerance can see it
    val payloadStruct = struct(
      (col(rightTs).as(TsCol) +: payloadCols.map(col)): _*)
    val rightTagged = right.select(
      (keyCols.map(col) :+ col(rightTs).as(TsCol)
        :+ lit(0).as(SideCol) :+ payloadStruct.as(PayloadCol)): _*)
    val payloadType = rightTagged.schema(PayloadCol).dataType

    val leftTagged = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(SideCol, lit(1))
      .withColumn(PayloadCol, lit(null).cast(payloadType))

    // forward = backward on reversed time; side asc keeps right rows ahead
    // of left rows at equal ts (inclusive match) in both directions
    val tsOrder = if (direction == "backward") col(TsCol).asc else col(TsCol).desc
    val tieOrder = rightTieBreak.toSeq.map { c =>
      val f = col(PayloadCol).getField(c)
      if (direction == "backward") f.asc_nulls_first else f.desc_nulls_last
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsOrder +: col(SideCol).asc +: tieOrder): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rightTagged.unionByName(leftTagged, allowMissingColumns = true)
      .withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1)

    val withTol = toleranceUs match {
      case Some(tol) =>
        val dist = abs(unix_micros(col(TsCol)) - unix_micros(col(PayloadCol).getField(TsCol)))
        matched.withColumn(PayloadCol, when(dist <= tol, col(PayloadCol)))
      case None => matched
    }

    val unpacked = payloadCols.foldLeft(withTol) { (df, c) =>
      df.withColumn(c, col(PayloadCol).getField(c))
    }
    unpacked.drop(SideCol, TsCol, PayloadCol)
  }

  /** Point-in-interval join: every (point row, interval row) pair with
    * `points(pointCol)` in `[startCol, endCol]` (inclusive both ends), plus
    * equality on `keyCols`. Intervals may overlap — a point matches each
    * containing interval once.
    *
    * Mechanics: intervals explode into the bucket ids they span
    * (`floor(v / bucketWidth)`), points compute their single bucket, and the
    * containment predicate runs AFTER an equi-join on (keys, bucket). Each
    * qualifying pair meets in exactly one bucket — the point's — so no
    * dedup pass is needed. Choose `bucketWidth` near the typical interval
    * span: expansion factor is ~`1 + span/bucketWidth` per interval, and
    * candidate pairs per bucket shrink as buckets narrow.
    *
    * Column sets must be disjoint; both inputs keep all their columns. */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Double,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet.diff(keyCols.toSet))
    require(overlap.isEmpty, s"column collision: ${overlap.mkString(",")}")

    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")

    val p = points.withColumn("__rj_bucket", bucketOf(col(pointCol)))
    val i = intervals.withColumn("__rj_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))

    val joinKeys = keyCols :+ "__rj_bucket"
    p.join(i, joinKeys, "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__rj_bucket")
  }

  /** Time-weighted average per key for irregular time series: each
    * observation holds its value until the NEXT observation, so the mean
    * weights each value by its holding duration — the correct average for
    * sampled-on-change metrics where the arithmetic mean over-counts busy
    * periods. The last observation per key has no duration and is
    * excluded (standard left-closed convention). Returns `(key…, twa,
    * n_intervals, total_duration)`.
    *
    * One keyed `lead` window (partitioned by key — never global) + one
    * partial-aggregated groupBy; `tsCol` may be any numeric/timestamp
    * orderable whose differences are meaningful (epoch micros longs
    * recommended — mirrors cleanly into external oracles). */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    // tieCols make the value→duration pairing deterministic when two
    // observations share a timestamp (their dt is 0 and drops, but WHICH
    // of the tied values carries the following interval depends on order)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    val dt = (lead(col(tsCol), 1).over(w) - col(tsCol)).cast("double")
    df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("_dt", dt)
      .filter(col("_dt").isNotNull && col("_dt") > 0)
      .groupBy(keyCols.map(col): _*)
      .agg((sum(col(valueCol).cast("double") * col("_dt")) / sum(col("_dt")))
          .as("twa"),
        count(lit(1)).as("n_intervals"),
        sum(col("_dt")).cast("long").as("total_duration"))
  }

  /** Regularize an event series onto a dense per-key calendar: aggregate
    * into `stepHours` buckets, generate the full bucket spine from each
    * key's first to last observed bucket, left-join, and fill the gaps —
    * `n_events` 0, the value column either NULL (`fill = "null"`) or
    * forward-filled from the last observed bucket (`fill = "ffill"`, the
    * sampled-on-change convention). Output:
    * `(key…, bucket, n_events, value)`.
    *
    * Spine generation is `sequence(min, max, interval)` per KEY ROW — one
    * tiny row per key explodes into its own calendar, so no driver-side
    * range materialization and no cross join; the forward fill is one
    * keyed window (`last` ignoreNulls over unbounded-preceding). Dense
    * output size = keys × span/step — the caller's contract, exactly what
    * a resample means. */
  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, stepHours: Int = 1, fill: String = "ffill"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(stepHours >= 1, s"stepHours must be >= 1: $stepHours")
    require(Set("ffill", "null")(fill), s"fill must be ffill|null: $fill")
    val stepUs = stepHours * 3600000000L
    // floor division: the DSL `/` on longs is TRUE division (doubles);
    // the quotient (~5e5 for epoch-hours) stays far inside double exactness
    val bucket = timestamp_micros(
      (floor(unix_micros(col(tsCol)) / stepUs) * stepUs).cast("long"))
    val hourly = df
      .groupBy(keyCols.map(col) :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n_events"), avg(col(valueCol)).as("__v"))
    val spine = hourly
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(keyCols.map(col) :+ explode(sequence(col("__lo"), col("__hi"),
        expr(s"INTERVAL $stepHours HOURS"))).as("bucket"): _*)
    val joined = spine.join(hourly, keyCols :+ "bucket", "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
    val filled = fill match {
      case "null" => joined.withColumn("value", col("__v"))
      case "ffill" =>
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.withColumn("value", last(col("__v"), ignoreNulls = true).over(w))
    }
    filled.select(keyCols.map(col) :+ col("bucket") :+ col("n_events") :+ col("value"): _*)
  }

  /** Classical additive seasonal decomposition — y = trend + seasonal +
    * remainder over a REGULAR integer time index (the moving-average
    * decomposition behind every "is this weekly pattern or real growth?"
    * question; STL's simpler, deterministic ancestor). Trend is the
    * centered moving average of width `period` (the standard 2×p MA when
    * `period` is even: half-weight endpoints, so the window stays
    * symmetric); rows whose full window runs off either edge get NULL
    * trend. Seasonal indices are the per-phase means of the detrended
    * series, re-centered to sum to zero; remainder = y − trend −
    * seasonal. Output: `(t, y, trend, seasonal, remainder)`, one row per
    * input row.
    *
    * Scale: the series is calendar-bounded (a day/hour spine), but every
    * step is still a bounded keyed operation — the trend is ONE
    * broadcast-offsets explode + re-key by target index (never a global
    * window), seasonal is a `period`-bounded groupBy, and the final
    * assembly is two keyed joins. Nothing materializes on the driver. */
  def classicalDecompose(series: DataFrame, tCol: String, yCol: String,
      period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    val spark = series.sparkSession
    val base = series
      .select(col(tCol).cast("long").as("t"), col(yCol).cast("double").as("y"))
      .filter(col("t").isNotNull && col("y").isNotNull)
    val h = period / 2
    val even = period % 2 == 0
    // offset table: |o| = h gets weight 0.5 in the even-period 2xp MA
    val offsets = spark.range(-h, h + 1).select(col("id").as("o"),
      (if (even) when(abs(col("id")) === h, 0.5).otherwise(1.0)
       else lit(1.0)).as("w"))
    val full = if (even) period + 1 else period
    val trend = base.crossJoin(broadcast(offsets))
      .groupBy((col("t") + col("o")).as("t"))
      .agg(count(lit(1)).as("_cnt"), (sum(col("w") * col("y")) / period).as("_tr"))
      .filter(col("_cnt") === full)
      .select(col("t"), col("_tr"))
    val detr = base.join(trend, Seq("t"), "left")
      .withColumn("_phase", pmod(col("t"), lit(period.toLong)))
      .withColumn("_d", col("y") - col("_tr"))
    val phase = detr.filter(col("_d").isNotNull)
      .groupBy(col("_phase")).agg(avg(col("_d")).as("_s0"))
    val centered = phase
      .crossJoin(broadcast(phase.agg(avg(col("_s0")).as("_m"))))
      .select(col("_phase"), (col("_s0") - col("_m")).as("_s"))
    detr.join(broadcast(centered), Seq("_phase"), "left")
      .select(col("t"), col("y"), col("_tr").as("trend"),
        col("_s").as("seasonal"),
        (col("y") - col("_tr") - col("_s")).as("remainder"))
  }
}

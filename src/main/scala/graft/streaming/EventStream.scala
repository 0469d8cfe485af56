package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface over the `events` table shape (north-star
  * extension — the reference has no streaming at all, SURVEY §2.9; its
  * "chunked" processing is bounded batch iteration, which Spark subsumes).
  *
  * The same windowed aggregation is exposed twice:
  *  - [[hourlyAggBatch]] — the batch twin (oracle-checkable)
  *  - [[hourlyAggStream]] — `readStream` + watermark, for continuous
  *    ingestion. Identical logic → identical results on a closed input set.
  */
object EventStream {

  /** Tumbling-window aggregation per (hour, event_type) — batch form. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))

  /** Sliding-window aggregation (batch): overlapping epoch-aligned windows
    * of `windowHours` sliding every `slideHours` — each event lands in
    * `windowHours / slideHours` windows (the moving-average view the
    * tumbling [[hourlyAggBatch]] can't give). Output keyed by the window
    * START timestamp. Spark expands the slide assignments inline
    * (no self-union), then one partial-aggregated shuffle. */
  def slidingAggBatch(events: DataFrame, windowHours: Int = 2,
      slideHours: Int = 1): DataFrame = {
    require(windowHours >= 1 && slideHours >= 1 && windowHours % slideHours == 0,
      s"need windowHours ($windowHours) a positive multiple of slideHours ($slideHours)")
    events.groupBy(
        window(col("ts"), s"$windowHours hours", s"$slideHours hours").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Streaming twin of [[slidingAggBatch]]: overlapping watermarked
    * windows; append mode emits each window once its end passes the
    * watermark. State is bounded by (windows in the watermark horizon ×
    * keys) — slide controls the emission cadence. */
  def slidingAggStream(spark: SparkSession, dir: String, schema: StructType,
      windowHours: Int = 2, slideHours: Int = 1): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$windowHours hours", s"$slideHours hours"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Streaming PSI drift monitor: per tumbling event-time window, the
    * population-stability index of `valueCol`'s distribution against a
    * FIXED baseline — the alert a serving pipeline fires when today's
    * traffic stops looking like the corpus the model was trained on.
    * `edges` (sorted) define the bins: bin b counts values in
    * (edges(b−1), edges(b)]; `baselineRates` are the reference
    * per-bin shares (edges.length + 1 of them, e.g. the training
    * corpus's own rates). Output per closed window: (window, n, psi),
    * with each side's share floored at `eps` before the log-ratio — the
    * [[graft.profile.Drift.psiBins]] convention.
    *
    * Scale/streaming shape: binning is a chain of literal comparisons
    * (no float divide — nothing to drift across engines or partial
    * aggregations); the per-window state is ONE row of bins+1 counters
    * (conditional sums, map-side combined), and PSI is a pure projection
    * over that aggregated row — so state is O(windows-in-horizon), not
    * data-sized, and the whole monitor is one watermarked streaming
    * aggregation in append mode. The PSI term sum is a fixed
    * left-to-right fold over bins — deterministic, oracle-replayable. */
  def psiDriftStream(spark: SparkSession, dir: String, schema: StructType,
      valueCol: String, edges: Array[Double], baselineRates: Array[Double],
      eps: Double = 1e-6): DataFrame = {
    require(edges.nonEmpty && edges.sameElements(edges.sorted),
      "edges must be non-empty and sorted")
    require(baselineRates.length == edges.length + 1,
      s"need ${edges.length + 1} baseline rates, got ${baselineRates.length}")
    require(eps > 0.0, s"eps must be positive: $eps")
    val nBins = edges.length + 1
    val bin = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col(valueCol).cast("double") > e, 1).otherwise(0)
    }
    val counts = (0 until nBins).map(b =>
      sum(when(col("__bin") === b, 1L).otherwise(0L)).as(s"__c$b"))
    val agg = spark.readStream.schema(schema).parquet(dir)
      .filter(col(valueCol).isNotNull)
      .withWatermark("ts", "1 hour")
      .select(col("ts"), bin.as("__bin"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), counts: _*)
    val psi = (0 until nBins).map { b =>
      val pa = greatest(col(s"__c$b") / col("n"), lit(eps))
      val pb = lit(math.max(baselineRates(b), eps))
      (pa - pb) * log(pa / pb)
    }.reduceLeft(_ + _)
    agg.select(col("window"), col("n"), round(psi, 6).as("psi"))
  }

  /** Streaming form: parquet source, 1-hour watermark, append mode. The
    * window column is kept as (start, end) struct per streaming semantics. */
  def hourlyAggStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Session windows via stateful processing: events for the same user that
    * arrive within `gapMinutes` of each other belong to one session.
    * Batch form uses a gap-detection window (lag + cumulative session id) —
    * the standard sessionization algebra; the streaming twin would use
    * `groupByKey(...).flatMapGroupsWithState` with a timeout equal to the
    * gap. Output: one row per session with start/end/duration/event count. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      // gap compare at full microsecond precision (event timestamps carry
      // micros; second-truncation would misplace boundaries near the gap)
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("__session_id",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .drop("__session_id")
  }

  /** [[sessionize]] via Spark's NATIVE `session_window` operator (the
    * built-in gap-session aggregation, available batch and streaming) —
    * one groupBy, no explicit window/prefix-sum plumbing. Boundary
    * caveat: the native window is `[ts, ts + gap)`, so an event EXACTLY
    * `gap` after its predecessor starts a new session here, while the
    * window-formulation [[sessionize]] (strict `>` on the diff) keeps it
    * — identical outputs whenever no consecutive pair sits exactly on
    * the gap (the generic case for microsecond timestamps). */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .drop("session_window")

  /** Streaming twin of [[sessionize]]: custom session state via
    * `flatMapGroupsWithState` with an event-time timeout (the (c)-tier
    * extension point — no built-in operator has open-ended gap-session
    * semantics with per-key custom state).
    *
    * Per user the state holds the OPEN SESSIONS inside the watermark
    * horizon (each a start/end/count/sum summary — no event buffering).
    * Usually that is one session; it is a list because a late straggler
    * that is gap-separated from the newest session must be HELD, not
    * emitted: a later event still above the watermark can fall within
    * `gapMinutes` of it, and the batch twin would merge the two. Each
    * micro-batch merges its events into the session list interval-wise
    * (the same gap-chain algebra the batch twin applies globally), then
    * emits exactly the sessions whose `end + gap` the watermark has
    * passed — no in-horizon event can ever extend those, because rows
    * below the watermark are dropped before this operator. The event-time
    * timeout is armed at the earliest live `end + gap` so idle users
    * drain without new data. State is bounded by the number of active
    * users × sessions per watermark horizon (≤ horizon/gap + 1), the
    * property that keeps this runnable forever on an unbounded stream.
    *
    * Emission is therefore watermark-complete and nothing else:
    * `streamed ⊆ batch` structurally, and on a static directory the
    * output is exactly the batch sessions with
    * `session_end + gap < final watermark` (asserted in the spec). */
  def sessionizeStream(spark: SparkSession, dir: String, schema: StructType,
      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    // floorDiv/floorMod, not truncation: for pre-epoch timestamps getTime
    // is negative and truncating division would flip the sub-second part's
    // sign (1969-12-31T23:59:59.5 would read as +0.5s instead of -0.5s)
    def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
      t
    }

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, fromMicros(s.startUs), fromMicros(s.endUs), s.n,
        // same rounding contract as the batch twin's round(sum, 2): HALF_UP
        BigDecimal(s.sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)

    // Emit sessions the watermark has sealed; keep the rest in state with
    // the timeout armed at the earliest live end+gap. Strict `<`: an event
    // at exactly end+gap == watermark is not late and still extends.
    def flush(userId: Long, sessions: Seq[OpenSession],
        state: GroupState[OpenSessions]): Iterator[ClosedSession] = {
      val wmUs = state.getCurrentWatermarkMs * 1000L
      val (expired, live) = sessions.partition(s => s.endUs + gapUs < wmUs)
      if (live.isEmpty) state.remove()
      else {
        state.update(OpenSessions(live))
        // Arm at floor(end+gap in ms): the timeout fires when the watermark
        // is STRICTLY past it, and wm_ms > floor(X_us/1000) ⟺ wm_us > X_us
        // (the watermark is ms-quantized) — so timeout-fire ⟺ sealed, with
        // no sub-millisecond gap between the two conditions. Clamped above
        // the current watermark per the GroupState contract.
        val dueMs = live.map(s => Math.floorDiv(s.endUs + gapUs, 1000L)).min
        state.setTimeoutTimestamp(math.max(dueMs, state.getCurrentWatermarkMs + 1L))
      }
      expired.sortBy(_.startUs).map(close(userId, _)).iterator
    }

    def fold(userId: Long, events: Iterator[SessionEvent],
        state: GroupState[OpenSessions]): Iterator[ClosedSession] = {
      val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      if (state.hasTimedOut) return flush(userId, prior, state)
      // per-batch in-memory merge: bounded by one user's events in one
      // micro-batch plus its open sessions (state never buffers events)
      val items = (prior ++ events.map(e =>
          OpenSession(micros(e.ts), micros(e.ts), 1, e.value)))
        .sortBy(s => (s.startUs, s.endUs))
      val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
      items.foreach { s =>
        if (merged.nonEmpty && s.startUs - merged.last.endUs <= gapUs) {
          val l = merged.last
          merged(merged.length - 1) = OpenSession(l.startUs,
            math.max(l.endUs, s.endUs), l.n + s.n, l.sum + s.sum)
        } else merged += s
      }
      flush(userId, merged.toSeq, state)
    }

    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", s"$gapMinutes minutes")
      .selectExpr("user_id", "ts", "value")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF()
  }

  /** Streaming ingestion dedup — the streaming twin of the batch dedup
    * family: drop repeats of `keyCols` whose event time falls inside the
    * watermark horizon. State is bounded by the watermark (keys older than
    * `watermark` are evicted), which is what makes exactly-once-per-key
    * ingestion viable on an unbounded stream; the batch twin
    * (`IndexOps.dedupFirstWins`) gives the closed-set semantics. */
  def dedupStream(spark: SparkSession, dir: String, schema: StructType,
      keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming admission dedup: an incoming DOCUMENT stream (file source)
    * probed against the stored LSH corpus tables written by
    * [[graft.operators.Dedup.precomputeLshCorpus]] — the continuous form
    * of the batch [[graft.operators.Dedup.minhashLshProbeStored]]. All
    * stream-side work is stateless projection (compiled shingle/MinHash/
    * band kernels) plus stream-static equi-joins, so every micro-batch
    * flags its near-duplicates of the historical corpus the moment it
    * lands. Output: `(new_id, corpus_id, jaccard)`.
    *
    * The one stateful operator is the final `dropDuplicates` (the same
    * pair can match through several bands; a stream cannot re-join itself
    * to distinct candidates FIRST the way the batch probe does, so
    * verification runs per matching band and the pair set dedups after).
    * On a production continuous stream, bound that state with
    * `withWatermark` + `dropDuplicatesWithinWatermark` on an arrival-time
    * column; on a closed input set the unbounded form is exact.
    *
    * Parameters must match the precompute call — [[Dedup.banded]] is
    * bit-identical across call sites, which is what makes the stored
    * buckets probe-able at all. */
  def dedupProbeStream(spark: SparkSession, dir: String, schema: StructType,
      idCol: String, textCol: String, tablePrefix: String,
      shingleSize: Int = 3, numHashes: Int = 32, numBands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    import graft.functions.kernels.TextKernelFunctions
    import graft.operators.Dedup
    val corpusBuckets = spark.table(s"${tablePrefix}_buckets")
      .withColumnRenamed("id", "corpus_id")
    val corpusShingles = spark.table(s"${tablePrefix}_shingles")
      .select(col("id").as("corpus_id"), col("shingles").as("sh_b"))
    val base = spark.readStream.schema(schema).parquet(dir)
      .select(col(idCol).as("id"),
        TextKernelFunctions.shingleHashSet(col(textCol), shingleSize).as("sh_a"))
      .filter(size(col("sh_a")) > 0)
      .withColumn("sig", TextKernelFunctions.minhashSignature(col("sh_a"), numHashes))
    Dedup.banded(base, numHashes, numBands, carry = Seq("sh_a"))
      .join(corpusBuckets, Seq("band", "bucket"))
      .join(corpusShingles, Seq("corpus_id"))
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
        lit(threshold) * greatest(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      .withColumn("jaccard", TextKernelFunctions.sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id").as("new_id"), col("corpus_id"), col("jaccard"))
      .dropDuplicates("new_id", "corpus_id")
  }

  /** Stream-static enrichment: left-join each micro-batch of `stream`
    * against a static dimension with an explicit broadcast — the standard
    * pattern for attaching slowly-changing reference data (user → cohort,
    * domain → policy) to an event stream. Stateless: no watermark, no
    * stream state store; the static side re-resolves per micro-batch, so a
    * dimension backed by a parquet path picks up file-level updates. At
    * scale the broadcast keeps every micro-batch shuffle-free — the stream
    * side is never repartitioned for the join. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    stream.join(broadcast(dim), keys, "left")
  }

  /** Attribution-window join, batch form: every (purchase, prior view)
    * pair for the same user with the view inside `maxLagMinutes` before
    * the purchase — the windowed generalization of the as-of join
    * ([[graft.operators.Temporal.asofJoin]] keeps only the latest view;
    * this keeps the qualifying SET, the shape ad-attribution and
    * session-stitching need). Planned as a hash equi-join on `user_id`
    * with the time range as a post-join filter — one key shuffle, no
    * inequality-join nested loop. */
  def attributionJoinBatch(events: DataFrame, maxLagMinutes: Int): DataFrame = {
    require(maxLagMinutes > 0, s"lag must be positive: $maxLagMinutes")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    p.join(v, Seq("user_id"))
      .filter(col("view_ts") <= col("purchase_ts") &&
        unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")) <=
          maxLagMinutes * 60000000L)
  }

  /** Streaming form: a stream-stream inner join with watermarks on BOTH
    * sides and an event-time range constraint — exactly the state-bounding
    * contract Structured Streaming requires (each side's state expires once
    * the other side's watermark passes the range), so join state is bounded
    * by `watermark + maxLagMinutes` of events per user regardless of stream
    * length. */
  def attributionJoinStream(spark: SparkSession, dir: String, schema: StructType,
      maxLagMinutes: Int, watermark: String = "1 hour"): DataFrame =
    attributionJoin(spark, dir, schema, maxLagMinutes, watermark, "inner")

  /** LEFT-OUTER twin of [[attributionJoinStream]]: purchases with no view
    * inside the lag window still emit — with null view columns — once the
    * watermark passes their timestamp. This is the streaming semantics the
    * inner join cannot give: "which conversions had NO preceding touch" is
    * itself a real-time signal (organic conversions, attribution gaps).
    *
    * State story: a purchase row is closable once `watermark >
    * purchase_ts` — the join condition bounds matching views by
    * `view_ts <= purchase_ts`, and views below the watermark are dropped,
    * so no future view can reach it; Spark then emits the null-padded row
    * and evicts the state. Purchases inside the final watermark horizon
    * (`purchase_ts >= max(ts) − delay` on a closed input) stay in state
    * and emit nothing — exactly the rows a restarted stream could still
    * match. Bounded state: both sides age out at the watermark, same as
    * the inner form. */
  def attributionJoinLeftStream(spark: SparkSession, dir: String, schema: StructType,
      maxLagMinutes: Int, watermark: String = "1 hour"): DataFrame =
    attributionJoin(spark, dir, schema, maxLagMinutes, watermark, "leftOuter")

  private def attributionJoin(spark: SparkSession, dir: String, schema: StructType,
      maxLagMinutes: Int, watermark: String, joinType: String): DataFrame = {
    require(maxLagMinutes > 0, s"lag must be positive: $maxLagMinutes")
    val ev = spark.readStream.schema(schema).parquet(dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $maxLagMinutes MINUTES"),
      joinType)
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("purchase_value"), col("view_id"), col("view_ts"))
  }

  /** Run the streaming query to completion over a static directory (memory
    * sink) and return the result — used by tests to prove stream/batch
    * equivalence. */
  def runStreamToCompletion(spark: SparkSession, dir: String, schema: StructType,
      queryName: String = "graft_events_stream"): DataFrame = {
    val q = hourlyAggStream(spark, dir, schema)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}

/** One event as seen by the session-state machine. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** One open session summary — fixed size, no event buffering.
  * Timestamps in epoch microseconds (event precision). */
final case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)

/** Per-user session state: the gap-disjoint open sessions still inside the
  * watermark horizon (almost always one; more when late stragglers are
  * being held for possible merges). */
final case class OpenSessions(sessions: Seq[OpenSession])

/** An emitted (gap-closed or timed-out) session; mirrors the batch
  * [[EventStream.sessionize]] output schema. */
final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, session_value: Double)

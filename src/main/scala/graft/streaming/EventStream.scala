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

  /** Streaming twin of [[sessionize]]: custom session state via
    * `flatMapGroupsWithState` with an event-time timeout (the (c)-tier
    * extension point — no built-in operator has open-ended gap-session
    * semantics with per-key custom state).
    *
    * Per user the state holds the one open session (start/end/count/sum —
    * O(1) per key, no event buffering). Each micro-batch folds its events
    * in timestamp order: an event within `gapMinutes` of the open session's
    * end extends it, otherwise the open session is emitted closed and a new
    * one starts. The timeout is re-armed to `session_end + gap`; when the
    * watermark passes it, the session is emitted by the timeout path and
    * state is dropped — so state size is bounded by the number of *active*
    * users inside the watermark horizon, the property that keeps this
    * runnable forever on an unbounded stream.
    *
    * Closed-set caveat (asserted in the spec): sessions still open when the
    * input is exhausted sit in state waiting for a watermark that no longer
    * advances, so on a static directory the output is exactly the batch
    * result *minus* each user's final session. */
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

    def fold(userId: Long, events: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        return out
      }
      // per-batch in-memory sort: bounded by one user's events in one
      // micro-batch (the state itself never buffers events)
      val sorted = events.toArray.sortBy(e => micros(e.ts))
      val closed = Seq.newBuilder[ClosedSession]
      var open = state.getOption
      sorted.foreach { e =>
        val t = micros(e.ts)
        open match {
          // in-gap events from a LATER micro-batch may precede the open
          // session (late but inside the watermark): they extend the
          // session backward, matching the batch twin's global sort
          case Some(s) if t >= s.startUs - gapUs && t - s.endUs <= gapUs =>
            open = Some(OpenSession(math.min(s.startUs, t), math.max(s.endUs, t),
              s.n + 1, s.sum + e.value))
          case Some(s) if t < s.startUs - gapUs =>
            // gap-separated BEFORE the open session: a late straggler that
            // forms its own (already closed) session — emit immediately,
            // never absorb it into the newer session
            closed += close(userId, OpenSession(t, t, 1, e.value))
          case Some(s) =>
            closed += close(userId, s)
            open = Some(OpenSession(t, t, 1, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L) // timeout API is millis
      }
      closed.result().iterator
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
      maxLagMinutes: Int, watermark: String = "1 hour"): DataFrame = {
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
      "inner")
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

/** The open session per user — fixed-size state, no event buffering.
  * Timestamps in epoch microseconds (event precision). */
final case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)

/** An emitted (gap-closed or timed-out) session; mirrors the batch
  * [[EventStream.sessionize]] output schema. */
final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, session_value: Double)

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
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col("ts").cast("long") - col("__prev_ts").cast("long") > gapMinutes * 60L, 1L)
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

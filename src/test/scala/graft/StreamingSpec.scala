package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming hourly agg matches its batch twin on a closed input") {
    // The driver's events table stores TIMESTAMP(NANOS), which Spark's
    // streaming parquet source rejects (batch reads truncate to micros).
    // Stage through a micros rewrite — what a real ingestion layer lands.
    val dir = tmpDir("events-stream") + "/events"
    graft.sources.EventsSource.read(spark, sf("events")).write.parquet(dir)
    val batch = EventStream.hourlyAggBatch(spark.read.parquet(dir))
      .select($"hour", $"event_type", $"n_events", $"sum_value")
    val schema = spark.read.parquet(dir).schema
    val streamed = EventStream.runStreamToCompletion(spark, dir, schema)
      .select($"window.start".as("hour"), $"event_type", $"n_events", $"sum_value")
    assert(batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup drops in-watermark repeats, keeps one row per key") {
    val dir = tmpDir("events-dedup") + "/events"
    val base = graft.sources.EventsSource.read(spark, sf("events")).limit(200)
    base.union(base).write.parquet(dir) // every event duplicated
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.dedupStream(spark, dir, schema, Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_t").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("dedup_t")
    assert(out.count() == base.select("event_id").distinct().count())
    assert(out.groupBy("event_id").count().filter($"count" > 1).isEmpty)
  }
}

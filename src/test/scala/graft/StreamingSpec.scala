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

  test("psiDriftStream: baseline hour scores 0, skewed hour alerts") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 10 matches the 50/50 baseline; hour 11 is all-low (skewed);
    // the hour-13 sentinel advances the watermark past both
    val rows = Seq(
      (ts(10, 5), 5.0), (ts(10, 10), 15.0),
      (ts(11, 5), 5.0), (ts(11, 10), 5.0), (ts(11, 15), 5.0), (ts(11, 20), 5.0),
      (ts(13, 0), 15.0))
    val dir = tmpDir("psi-stream") + "/events"
    rows.toDF("ts", "value").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = EventStream.psiDriftStream(spark, dir, schema, "value",
      edges = Array(10.0), baselineRates = Array(0.5, 0.5))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("psi_drift_t").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("psi_drift_t")
      .select(date_format($"window.start", "HH").as("h"), $"n", $"psi")
      .orderBy($"h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("10", 2L), ("11", 4L)))
    assert(out(0)._3 == 0.0)              // on-baseline hour: psi exactly 0
    assert(out(1)._3 > 1.0, s"skewed hour psi ${out(1)._3}") // major shift
  }

  test("sessionizeStream emits exactly the batch sessions closed by the watermark") {
    val dir = tmpDir("events-sess") + "/events"
    graft.sources.EventsSource.read(spark, sf("events")).write.parquet(dir)
    val events = spark.read.parquet(dir)
    val schema = events.schema
    val gap = 30

    val q = EventStream.sessionizeStream(spark, dir, schema, gapMinutes = gap)
      .writeStream.outputMode("append").format("memory").queryName("sess_t").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_t")
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"session_value")

    val batch = EventStream.sessionize(events, gapMinutes = gap)
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"session_value")

    // Closed-set semantics: a static source stops advancing the watermark at
    // max(ts) - gap, and a session is sealed only once the watermark passes
    // its end + gap (an earlier emit could still be merged with a late
    // in-horizon event). Everything emitted must be a batch session, and
    // every batch session sealed by the final watermark must have been
    // emitted: due ⟺ end + gap < maxTs - gap.
    val maxTs = events.agg(max($"ts")).as[java.sql.Timestamp].head()
    val sealLine = new java.sql.Timestamp(maxTs.getTime - 2L * gap * 60000L)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty,
      "stream emitted a session the batch twin does not have")
    val due = batch.filter($"session_end" < lit(sealLine))
    assert(due.exceptAll(streamed).isEmpty,
      "a watermark-expired session was never emitted")
  }

  test("sessionizeStream holds stragglers until sealed — no sub-batch sessions") {
    import java.sql.Timestamp
    val dir = tmpDir("events-straggle") + "/events"
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")
    // batch 1: a straggler at 12:50 and a gap-separated event at 13:30 in
    // the SAME batch. The old code emitted [12:50,12:50] immediately; but
    // 13:10 (still above the 13:00 watermark) arrives later and bridges
    // them — the batch twin has ONE session 12:50..13:30, so the early
    // emit violated streamed ⊆ batch.
    Seq((1L, t("12:50"), 1.0), (1L, t("13:30"), 1.0))
      .toDF("user_id", "ts", "value").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.sessionizeStream(spark, dir, schema, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("straggle_t").start()
    q.processAllAvailable()
    // batch 2: the bridging event, plus a far event to advance the watermark
    Seq((1L, t("13:10"), 1.0), (2L, t("23:00"), 0.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val out = spark.table("straggle_t").filter($"user_id" === 1L).collect()
    assert(out.length == 1, s"expected one merged session, got ${out.toSeq}")
    assert(out.head.getAs[Timestamp]("session_start") == t("12:50"))
    assert(out.head.getAs[Timestamp]("session_end") == t("13:30"))
    assert(out.head.getAs[Long]("n_events") == 3L)
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

  test("stream-static enrichment matches the batch join, no stream state") {
    val dir = tmpDir("events-enrich") + "/events"
    graft.sources.EventsSource.read(spark, sf("events")).limit(500).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val dim = spark.read.parquet(dir)
      .select($"user_id").distinct()
      .withColumn("cohort", concat(lit("c"), ($"user_id" % 3).cast("string")))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.enrichStream(stream, dim, Seq("user_id"))
      .select($"event_id", $"user_id", $"cohort")
      .writeStream.outputMode("append").format("memory").queryName("enrich_t").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enrich_t")
    val batch = EventStream.enrichStream(spark.read.parquet(dir), dim, Seq("user_id"))
      .select($"event_id", $"user_id", $"cohort")
    assert(streamed.count() == 500)
    assert(streamed.filter($"cohort".isNull).isEmpty) // every event enriched
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sessionizeStream: late in-gap events extend the session backward") {
    import java.sql.Timestamp
    val dir = tmpDir("events-late") + "/events"
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // batch 1: events at 10:10 and 10:20 (open session), plus a far-future
    // event to advance the watermark later
    Seq((1L, ts(10), 1.0), (1L, ts(20), 1.0))
      .toDF("user_id", "ts", "value").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.sessionizeStream(spark, dir, schema, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("late_t").start()
    q.processAllAvailable()
    // batch 2: a LATE event at 10:05 (in-gap, precedes the open session's
    // start) and a far event that closes the session via gap
    Seq((1L, ts(5), 1.0), (2L, Timestamp.valueOf("2024-01-01 23:00:00"), 0.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(dir)
    q.processAllAvailable()
    // batch 3: advance user 1 past the gap so the session closes
    Seq((1L, Timestamp.valueOf("2024-01-01 12:00:00"), 0.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val closed = spark.table("late_t").filter($"user_id" === 1L).collect()
    assert(closed.length == 1)
    // the late 10:05 event extended the session backward, matching batch
    assert(closed.head.getAs[Timestamp]("session_start") == ts(5))
    assert(closed.head.getAs[Long]("n_events") == 3L)
  }

  test("stream-stream attribution join matches its batch twin on a closed input") {
    val dir = tmpDir("events-attr") + "/events"
    graft.sources.EventsSource.read(spark, sf("events")).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val cols = Seq($"purchase_id", $"user_id", $"purchase_ts", $"view_id", $"view_ts")
    val q = EventStream.attributionJoinStream(spark, dir, schema, maxLagMinutes = 30)
      .select(cols: _*)
      .writeStream.outputMode("append").format("memory").queryName("attr_t").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attr_t")
    val batch = EventStream.attributionJoinBatch(spark.read.parquet(dir), 30)
      .select(cols: _*)
    assert(batch.count() > 0, "fixture must produce at least one attribution pair")
    // append-mode stream-stream inner join emits matched pairs as watermarks
    // close them; on a closed input the emitted set may lag the final
    // watermark only for pairs in the last window — both directions checked
    assert(streamed.exceptAll(batch).isEmpty, "stream emitted a pair batch does not have")
    val missing = batch.exceptAll(streamed).count()
    assert(missing == 0, s"stream failed to emit $missing closed pairs")
  }

  test("left-outer attribution stream: unmatched purchases emit nulls at expiry") {
    val dir = tmpDir("events-attr-left") + "/events"
    graft.sources.EventsSource.read(spark, sf("events")).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = EventStream.attributionJoinLeftStream(spark, dir, schema, maxLagMinutes = 30)
      .select($"purchase_id", $"view_id")
      .writeStream.outputMode("append").format("memory").queryName("attr_left_t").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attr_left_t")

    val ev = spark.read.parquet(dir)
    val matched = EventStream.attributionJoinBatch(ev, 30)
      .select($"purchase_id", $"view_id")
    // final GLOBAL watermark: each watermark node sees only ITS filtered
    // stream (purchases / views), so the global value is the MIN of the
    // two per-side (ms-floored max − 1 h) watermarks — using the
    // all-events max here retires one extra purchase and fails
    val wmUs = ev.groupBy($"event_type")
      .agg((floor(unix_micros(max($"ts")) / 1000) * 1000 - 3600000L * 1000).as("w"))
      .filter($"event_type".isin("purchase", "view"))
      .agg(min($"w")).head.getLong(0)
    val unmatchedExpired = ev.filter($"event_type" === "purchase")
      .filter(unix_micros($"ts") < wmUs)
      .join(matched.select($"purchase_id"), ev("event_id") === matched("purchase_id"),
        "left_anti")
      .select($"event_id".as("purchase_id"), lit(null).cast("long").as("view_id"))
    val expected = matched.unionByName(unmatchedExpired)

    assert(unmatchedExpired.count() > 0, "fixture must contain expired unmatched purchases")
    assert(streamed.filter($"view_id".isNull).count() == unmatchedExpired.count(),
      "every expired unmatched purchase emits exactly one null row")
    assert(streamed.exceptAll(expected).isEmpty, "stream emitted a row the model does not have")
    assert(expected.exceptAll(streamed).isEmpty, "stream failed to emit a modeled row")
  }

  test("slidingAggBatch: every event lands in exactly window/slide windows") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:15:00"), "view", 2.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:45:00"), "view", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = graft.streaming.EventStream.slidingAggBatch(ev, 2, 1)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3))).toSet
    // event 1 → windows starting 09:00, 10:00; event 2 → 10:00, 11:00;
    // the 10:00 window holds both
    assert(out == Set(
      ("2024-01-01 09:00:00.0", 1L, 2.0),
      ("2024-01-01 10:00:00.0", 2L, 5.0),
      ("2024-01-01 11:00:00.0", 1L, 3.0)))
    // total contribution count = events × window/slide
    val total = graft.streaming.EventStream.slidingAggBatch(ev, 2, 1)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect().head.getLong(0)
    assert(total == 2L * 2)
  }

  test("streaming corpus probe matches the batch probe pair-for-pair") {
    val docs = spark.read.parquet(sf("documents"))
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val batchIn = docs.filter($"doc_id" % 2 === 1)
    val prefix = "graft_lsh_streamspec"
    graft.operators.Dedup.precomputeLshCorpus(corpus, "doc_id", "text", prefix)
    try {
      val dir = tmpDir("docs-probe") + "/docs"
      batchIn.write.parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val q = EventStream.dedupProbeStream(spark, dir, schema,
          "doc_id", "text", prefix, threshold = 0.7)
        .writeStream.outputMode("append").format("memory").queryName("probe_t").start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("probe_t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.operators.Dedup.minhashLshAgainst(
          batchIn, corpus, "doc_id", "text", threshold = 0.7, materialize = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch,
        s"stream/batch probe diverge: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
      assert(streamed.nonEmpty, "fixture must produce at least one cross-parity pair")
    } finally {
      Seq("buckets", "shingles").foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$s"))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // trades (left) and quotes (right) — the canonical as-of fixture
  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2024-01-01 10:00:30"), 101.0),
    (3L, "B", ts("2024-01-01 10:00:10"), 50.0),
    (4L, "B", ts("2024-01-01 09:59:00"), 49.0) // before any quote
  ).toDF("trade_id", "sym", "ts", "price")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 10L, 99.5),
    ("A", ts("2024-01-01 10:00:20"), 11L, 100.5),
    ("B", ts("2024-01-01 10:00:10"), 12L, 49.9) // equal ts → inclusive match
  ).toDF("sym", "qts", "quote_id", "bid")

  test("asofJoin backward picks latest quote at-or-before, nulls when none") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "qts")
      .select($"trade_id", $"quote_id", $"bid").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(10L), Some(99.5)),
      (2L, Some(11L), Some(100.5)),
      (3L, Some(12L), Some(49.9)), // ts == qts is a match
      (4L, None, None)))           // no quote at or before
  }

  test("asofJoin forward picks earliest quote at-or-after") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "qts",
        direction = "forward")
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(11L)), (2L, None), (3L, Some(12L)), (4L, Some(12L))))
  }

  test("asofJoin tolerance nulls out stale matches") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "qts",
        toleranceUs = Some(10L * 1000000))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    // trade 2 is 10s after quote 11 (inside), trade 1 is 5s after quote 10
    assert(out === Seq(
      (1L, Some(10L)), (2L, Some(11L)), (3L, Some(12L)), (4L, None)))
  }

  test("asofJoin breaks same-timestamp ties by rightTieBreak (largest wins)") {
    val dupQuotes = quotes.unionByName(
      Seq(("A", ts("2024-01-01 10:00:00"), 99L, 77.7)).toDF("sym", "qts", "quote_id", "bid"))
    val out = Temporal.asofJoin(trades.filter($"trade_id" === 1), dupQuotes,
        Seq("sym"), "ts", "qts", rightTieBreak = Some("quote_id"))
      .select($"quote_id", $"bid").as[(Long, Double)].head()
    assert(out === ((99L, 77.7)))
  }

  test("asofJoin does not tear payload columns with legitimately-null values") {
    val q = Seq(
      ("A", ts("2024-01-01 10:00:00"), 10L, Some(99.5)),
      ("A", ts("2024-01-01 10:00:20"), 11L, None: Option[Double])
    ).toDF("sym", "qts", "quote_id", "bid")
    val out = Temporal.asofJoin(trades.filter($"trade_id" === 2), q,
        Seq("sym"), "ts", "qts")
      .select($"quote_id", $"bid").as[(Long, Option[Double])].head()
    // quote 11 matches; its null bid must NOT be backfilled from quote 10
    assert(out === ((11L, None)))
  }

  test("asofJoin plan: one hash exchange on the keys, no join operator") {
    val plan = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "qts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }

  private lazy val points = Seq((1L, 0.5), (2L, 2.0), (3L, 10.0), (4L, -1.0))
    .toDF("pid", "v")
  private lazy val intervals = Seq(("a", 0.0, 2.0), ("b", 1.5, 5.0), ("c", 8.0, 9.0))
    .toDF("ival", "lo", "hi")

  test("rangeJoin matches inclusive containment, overlaps, and misses") {
    val out = Temporal.rangeJoin(points, intervals, "v", "lo", "hi", bucketWidth = 1.0)
      .select($"pid", $"ival").as[(Long, String)].collect().sorted
    // 0.5∈a; 2.0∈a (inclusive hi) and ∈b; 10.0 and -1.0 match nothing
    assert(out === Seq((1L, "a"), (2L, "a"), (2L, "b")))
  }

  test("rangeJoin result is bucketWidth-invariant and duplicate-free") {
    val wide = Temporal.rangeJoin(points, intervals, "v", "lo", "hi", bucketWidth = 100.0)
      .select($"pid", $"ival").as[(Long, String)].collect().sorted
    val narrow = Temporal.rangeJoin(points, intervals, "v", "lo", "hi", bucketWidth = 0.25)
      .select($"pid", $"ival").as[(Long, String)].collect().sorted
    assert(wide === narrow)
  }

  test("rangeJoin plans as an equi-join, not a nested-loop join") {
    val plan = Temporal.rangeJoin(points, intervals, "v", "lo", "hi", bucketWidth = 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to all-pairs:\n$plan")
  }

  test("rangeJoin honors extra equality keys") {
    val p = Seq((1L, "x", 1.0), (2L, "y", 1.0)).toDF("pid", "k", "v")
    val i = Seq(("x", 0.0, 2.0)).toDF("k", "lo", "hi")
    val out = Temporal.rangeJoin(p, i, "v", "lo", "hi", 1.0, keyCols = Seq("k"))
      .select($"pid").as[Long].collect().toSeq
    assert(out === Seq(1L))
  }

  test("timeWeightedAvg: durations weight values; last point excluded; ties deterministic") {
    val obs = Seq(
      // key a: value 10 for 4 units, then 20 for 1 unit -> twa = 12
      ("a", 1L, 0L, 10.0), ("a", 2L, 4L, 20.0), ("a", 3L, 5L, 99.0),
      // key b: tie at t=0 — event_id order decides which value spans [0,2)
      ("b", 1L, 0L, 1.0), ("b", 2L, 0L, 3.0), ("b", 3L, 2L, 7.0))
      .toDF("k", "event_id", "t", "v")
    val out = Temporal.timeWeightedAvg(obs, Seq("k"), "t", "v",
        tieCols = Seq("event_id"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((12.0, 2L, 5L)))
    // b: (1.0, dt=0 dropped), (3.0, dt=2): twa = 3.0 over 1 interval
    assert(out("b") == ((3.0, 1L, 2L)))
  }

  test("resample: dense spine, zero-count gaps, forward-filled values") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("a", t("2024-01-01 10:10:00"), 2.0),
      ("a", t("2024-01-01 10:50:00"), 4.0),
      // gap at 11 and 12
      ("a", t("2024-01-01 13:05:00"), 10.0),
      ("b", t("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "ts", "v")
    val out = graft.operators.Temporal.resample(ev, Seq("k"), "ts", "v")
      .orderBy("k", "bucket")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 10:00:00.0", 2L, 3.0),  // avg(2,4)
      ("a", "2024-01-01 11:00:00.0", 0L, 3.0),  // gap: ffill
      ("a", "2024-01-01 12:00:00.0", 0L, 3.0),
      ("a", "2024-01-01 13:00:00.0", 1L, 10.0),
      ("b", "2024-01-01 00:00:00.0", 1L, 1.0)))
    // fill = "null" leaves gap values NULL
    val nulls = graft.operators.Temporal.resample(ev, Seq("k"), "ts", "v",
      fill = "null").filter($"n_events" === 0)
    assert(nulls.collect().forall(_.isNullAt(3)))
  }

  test("classicalDecompose: exact recovery of trend+seasonal, edge NULLs") {
    import spark.implicits._
    // even period 4: y = 10 + t + s(t%4), s = (2,-1,0,-1) sums to zero.
    // The 2x4 centered MA reproduces the linear trend exactly and kills
    // the seasonal, so interior rows decompose exactly.
    val s4 = Seq(2.0, -1.0, 0.0, -1.0)
    val df = (0L until 24L).map(t => (t, 10.0 + t + s4((t % 4).toInt)))
      .toDF("t", "y")
    val out = Temporal.classicalDecompose(df, "t", "y", period = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (t <- 2L to 21L) {
      val r = out(t)
      assert(math.abs(r.getAs[Double]("trend") - (10.0 + t)) < 1e-9, s"t=$t")
      assert(math.abs(r.getAs[Double]("seasonal") - s4((t % 4).toInt)) < 1e-9)
      assert(math.abs(r.getAs[Double]("remainder")) < 1e-9)
    }
    // the half-weight window needs t-2..t+2: first/last two rows NULL
    for (t <- Seq(0L, 1L, 22L, 23L)) {
      assert(out(t).isNullAt(2) && out(t).isNullAt(4), s"edge t=$t")
      assert(!out(t).isNullAt(3), "seasonal index still joins at edges")
    }
    // odd period 3: plain width-3 MA, edges are one row each side
    val s3 = Seq(3.0, 0.0, -3.0)
    val d3 = (0L until 12L).map(t => (t, 5.0 + s3((t % 3).toInt))).toDF("t", "y")
    val o3 = Temporal.classicalDecompose(d3, "t", "y", period = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (t <- 1L to 10L) {
      assert(math.abs(o3(t).getAs[Double]("trend") - 5.0) < 1e-9)
      assert(math.abs(o3(t).getAs[Double]("seasonal") - s3((t % 3).toInt)) < 1e-9)
    }
    assert(o3(0L).isNullAt(2) && o3(11L).isNullAt(2))
  }
}

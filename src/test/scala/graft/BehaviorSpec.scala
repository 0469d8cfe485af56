package graft

import graft.operators.Behavior
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel requires stages strictly in order") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click BEFORE first view — purchase unreachable, depth 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 09:30:00"), "purchase"),
      // user 3: view only
      (3L, ts("2024-01-01 08:00:00"), "view"),
      // user 4: no funnel event at all
      (4L, ts("2024-01-01 08:00:00"), "error"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) == (("view", 3L, 1.0)))
    assert(out(2) == (("click", 1L, 0.3333)))
    assert(out(3) == (("purchase", 1L, 0.3333)))
  }

  test("funnel: equal timestamps do not advance (strict ordering)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"), // same instant — no advance
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:01"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) == 2L) // both users viewed
    assert(out(2) == 1L) // only user 2's click is strictly later
  }

  test("funnel: later re-view can unlock an earlier-blocked stage") {
    // view@12, click@10 (blocked), view@8? no — greedy takes earliest view,
    // then the NEXT click after it counts even if a later view also exists
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00"), "view"),
      (1L, ts("2024-01-01 07:00:00"), "click"), // before first view: dead
      (1L, ts("2024-01-01 09:00:00"), "click")) // after: counts
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(2) == 1L)
  }

  test("retention cohorts: offset-0 cell is the cohort size; retention ratios") {
    val ev = Seq(
      // cohort week of 2024-01-01 (epoch week floor(19723/7)): users 1,2
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-03 10:00:00")),
      // user 1 active next week too
      (1L, ts("2024-01-10 10:00:00")),
      // user 3 first appears in the next week
      (3L, ts("2024-01-10 12:00:00")))
      .toDF("user_id", "ts")
    val rows = Behavior.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
    val byKey = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val w0 = rows.map(_.getLong(0)).min
    assert(byKey((w0, 0L)) == ((2L, 2L, 1.0)))      // both users at offset 0
    assert(byKey((w0, 1L)) == ((1L, 2L, 0.5)))      // user 1 retained
    assert(byKey((w0 + 1, 0L)) == ((1L, 1L, 1.0))) // user 3's own cohort
  }

  test("mergeIntervals coalesces overlapping and touching, splits disjoint") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap → one island [0,20]
      (1L, 20L, 30L),                 // touching (start == max end) → merges
      (1L, 31L, 40L),                 // gap → new island
      (2L, 0L, 1L))                   // other key unaffected
      .toDF("k", "s", "e")
    val out = Behavior.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "island").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 1L, 0L, 30L, 3L), (1L, 2L, 31L, 40L, 1L),
      (2L, 1L, 0L, 1L, 1L)))
  }

  test("mergeIntervals: contained interval does not split the island") {
    // [0,100] then [10,20] (contained) then [50,60]: running max end keeps
    // the island open even though starts are increasing
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 50L, 60L), (1L, 101L, 110L))
      .toDF("k", "s", "e")
    val out = Behavior.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("island").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 100L), (2L, 101L, 110L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.MergeOps

class MergeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "bal")

  test("upsert replaces matched keys and appends new ones") {
    val updates = Seq((2L, "b2", 21.0), (9L, "i", 90.0)).toDF("k", "name", "bal")
    val out = MergeOps.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("applyChanges: highest seq wins, deletes drop keys, replay-idempotent") {
    val changes = Seq(
      (1L, "a", 0.0, "upsert", 1L),   // then deleted at seq 2
      (1L, "a", 0.0, "delete", 2L),
      (2L, "b", 0.0, "delete", 1L),   // then reinstated at seq 2
      (2L, "b9", 99.0, "upsert", 2L),
      (7L, "g", 70.0, "upsert", 1L))  // brand-new key
      .toDF("k", "name", "bal", "op", "seq")
    val out = MergeOps.applyChanges(base, changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (2L, "b9", 99.0), (3L, "c", 30.0), (7L, "g", 70.0)))
    // applying the same log to its own result changes nothing (replay)
    val again = MergeOps.applyChanges(
      MergeOps.applyChanges(base, changes, Seq("k")), changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("applyChanges tie on (key, seq): upsert deterministically beats delete") {
    val changes = Seq(
      (3L, "c2", 31.0, "upsert", 5L),
      (3L, "c", 0.0, "delete", 5L)).toDF("k", "name", "bal", "op", "seq")
    val out = MergeOps.applyChanges(base, changes, Seq("k"))
      .filter($"k" === 3L).collect()
    assert(out.length == 1 && out(0).getString(1) == "c2")
  }

  test("scd2History: validity chains per key, open current interval") {
    val changes = Seq(
      ("k1", 10L, "v1"), ("k1", 20L, "v2"), ("k1", 30L, "v3"),
      ("k2", 5L, "w1"))
      .toDF("k", "seq", "payload")
    val out = MergeOps.scd2History(changes, Seq("k"), "seq")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getInt(5)))
    assert(out.toSeq == Seq(
      ("k1", 10L, 20L, 0), ("k1", 20L, 30L, 0), ("k1", 30L, -1L, 1),
      ("k2", 5L, -1L, 1)))
    // intervals tile: each key's valid_to chain equals the next valid_from
  }

  test("merge plans: one anti-join, no global sort over the base") {
    val updates = Seq((2L, "b2", 21.0)).toDF("k", "name", "bal")
    val p = MergeOps.upsert(base, updates, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"unexpected product join:\n$p")
    // the change-log window partitions by key — never an unpartitioned sort
    val changes = Seq((2L, "b", 0.0, "delete", 1L)).toDF("k", "name", "bal", "op", "seq")
    val p2 = MergeOps.applyChanges(base, changes, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p2.contains("windowspecdefinition(k"), s"window not keyed:\n$p2")
  }
}

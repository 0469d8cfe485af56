package graft

import org.apache.spark.sql.functions._
import graft.ops.IndexOps

/** Mirrors /root/reference/test/indexes/test_indexes.py semantics. */
class IndexOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("global multi-column sort") {
    val df = Seq((2, 1, "b"), (1, 2, "a"), (1, 1, "c")).toDF("x", "y", "v")
    val got = IndexOps.sort(df, Seq("x", "y")).collect().map(_.getString(2)).toSeq
    assert(got == Seq("c", "a", "b"))
  }

  test("reindex: left join on intersecting keys, float→NaN, int→null, then sort") {
    val data = Seq((1, 10.0, 100L), (3, 30.0, 300L)).toDF("x", "f", "i")
    val newIndex = Seq(3, 2, 1).toDF("x")
    val out = IndexOps.reindex(newIndex, data).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3)) // sorted after reindex
    val missingRow = out(1)
    assert(missingRow.getDouble(1).isNaN)  // float fill = NaN
    assert(missingRow.isNullAt(2))         // int fill = null
    assert(out(0).getDouble(1) == 10.0 && out(2).getLong(2) == 300L)
  }

  test("reindex with no shared columns raises") {
    val data = Seq((1, 10.0)).toDF("x", "f")
    val newIndex = Seq(1).toDF("z")
    assertThrows[IllegalArgumentException](IndexOps.reindex(newIndex, data))
  }

  test("dedup keeps first occurrence by explicit order") {
    val df = Seq((1, 1, "first"), (1, 2, "dup"), (2, 1, "only")).toDF("k", "seq", "v")
    val out = IndexOps.dedupFirstWins(df, Seq("k"), orderColumns = Seq("seq"))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1).head().getString(2) == "first")
    assert(out.columns.toSeq == Seq("k", "seq", "v")) // helper columns dropped
  }

  test("stableRowNumber equals a global row_number across many partitions") {
    // 10k rows over 4 shuffled partitions: the two-phase numbering must
    // reproduce the single-partition window's result exactly
    val df = spark.range(10000).toDF("id")
      .withColumn("key", col("id") * 37 % 10007) // unique → total order
      .repartition(4)
    val got = IndexOps.stableRowNumber(df, Seq("key"))
      .select("key", "row_num").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select("key").collect().map(_.getLong(0)).sorted
      .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("stableRowNumber: string leading column takes the generic path, same result") {
    val df = (1 to 500).map(i => (f"k${i * 7 % 503}%04d", i)).toDF("s", "i")
      .repartition(4)
    val got = IndexOps.stableRowNumber(df, Seq("s"), "rn")
      .select("s", "rn").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.select("s").collect().map(_.getString(0)).sorted
      .zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("stableRowNumber: parquet-backed input (footer splits) matches global numbering") {
    val orders = spark.read.parquet(sf("orders"))
      .select(col("o_custkey"), col("o_orderkey"))
    val got = IndexOps.stableRowNumber(orders, Seq("o_custkey", "o_orderkey"))
      .select("o_orderkey", "row_num").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = orders.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex
      .map { case ((_, ok), i) => ok -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("stableRowNumber: nulls in the leading column number first (asc default)") {
    val df = Seq((Some(3.0), "a"), (None, "b"), (Some(1.0), "c"), (None, "a"))
      .toDF("v", "id").repartition(3)
    val got = IndexOps.stableRowNumber(df, Seq("v", "id"), "rn")
      .orderBy("rn").collect().map(r => (Option(r.get(0)), r.getString(1)))
    assert(got.toSeq == Seq((None, "a"), (None, "b"),
      (Some(1.0), "c"), (Some(3.0), "a")))
  }

  test("alignment validation passes on aligned, fails on misaligned") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, 9.0), (1, 8.0)).toDF("k", "w")
    IndexOps.validateIndexAlignment(Seq(a, b), Seq("k")) // order-insensitive: ok
    val c = Seq((1, 1.0), (3, 2.0)).toDF("k", "w")
    assertThrows[IllegalArgumentException](
      IndexOps.validateIndexAlignment(Seq(a, c), Seq("k")))
    // duplicate-count mismatch also fails (multiset semantics)
    val d = Seq((1, 1.0), (1, 2.0)).toDF("k", "w")
    assertThrows[IllegalArgumentException](
      IndexOps.validateIndexAlignment(Seq(a, d), Seq("k")))
  }
}

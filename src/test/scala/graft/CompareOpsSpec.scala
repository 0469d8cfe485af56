package graft

import org.apache.spark.sql.functions.col

import graft.ops.CompareOps

/** Mirrors /root/reference/test/compare/test_compare.py contract. */
class CompareOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("identical frames compare equal") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val r = CompareOps.compare(a, a)
    assert(r.allEqual && r.columnsMatch && r.numRowsMatch)
    assert(r.columns.values.forall(identity))
  }

  test("different values detected per column") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((1, "x"), (2, "z")).toDF("k", "v")
    val r = CompareOps.compare(a, b)
    assert(!r.allEqual)
    assert(r.columns("k") && !r.columns("v"))
  }

  test("missing columns reported left/right") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(1).toDF("k")
    val r = CompareOps.compare(a, b)
    assert(!r.columnsMatch)
    assert(r.missingColumns.leftOnly == Seq("v") && r.missingColumns.rightOnly.isEmpty)
    assert(!r.columns("v"))
  }

  test("dtype mismatch reported and column marked unequal") {
    val a = Seq((1, 1L)).toDF("k", "v")
    val b = Seq((1, "1")).toDF("k", "v")
    val r = CompareOps.compare(a, b)
    assert(!r.dtypes("v").matches && !r.columns("v"))
    assert(r.dtypes("v").left.contains("bigint") && r.dtypes("v").right.contains("string"))
  }

  test("row count mismatch") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(1, 2).toDF("k")
    val r = CompareOps.compare(a, b)
    assert(!r.numRowsMatch && r.numRowsLeft == 3 && r.numRowsRight == 2)
  }

  test("diffCounts multiset semantics") {
    val a = Seq(1, 1, 2, 3).toDF("k")
    val b = Seq(1, 2, 2, 4).toDF("k")
    val row = CompareOps.diffCounts(a, b).head()
    assert(row.getLong(0) == 2) // one extra 1, the 3
    assert(row.getLong(1) == 2) // one extra 2, the 4
    assert(row.getLong(2) == 2) // one 1, one 2
  }

  test("real file compares equal to itself including footer metadata") {
    val r = CompareOps.compareFiles(spark, sf("region"), sf("region"))
    assert(r.allEqual && r.metadata)
  }

  test("exact mode (exceptAll) agrees with fingerprint mode") {
    val a = Seq((1, "x", 2.5), (2, "y", Double.NaN)).toDF("k", "v", "d")
    val b = Seq((2, "y", Double.NaN), (1, "x", 2.5)).toDF("k", "v", "d") // reordered
    val fp = CompareOps.compare(a, b)
    val ex = CompareOps.compare(a, b, exact = true)
    assert(fp.allEqual && ex.allEqual)
    assert(fp.columns == ex.columns)
    val c = Seq((1, "x", 2.5), (2, "y", 9.9)).toDF("k", "v", "d")
    assert(!CompareOps.compare(a, c).columns("d"))
    assert(!CompareOps.compare(a, c, exact = true).columns("d"))
  }

  test("fingerprint compare of a 50-column frame runs at most 4 jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val cols = (1 to 50).map(i => s"c$i")
    val row1 = (1 to 50).map(_.toLong)
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row.fromSeq(row1),
        org.apache.spark.sql.Row.fromSeq(row1.map(_ + 1))),
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType))))
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = { counter.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = CompareOps.compare(df, df)
      Thread.sleep(500) // let queued listener events drain
      val jobs50 = counter.get()
      assert(r.allEqual)
      counter.set(0)
      val small = df.select("c1", "c2")
      assert(CompareOps.compare(small, small).allEqual)
      Thread.sleep(500)
      val jobs2 = counter.get()
      // job count must not scale with column count (vs 50 exceptAll jobs)
      assert(jobs50 <= jobs2 + 2, s"50-col compare ran $jobs50 jobs vs $jobs2 for 2-col")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("multiset fingerprint catches duplicate-shift differences") {
    // same distinct values, different multiplicities
    val a = Seq(1, 1, 2).toDF("k")
    val b = Seq(1, 2, 2).toDF("k")
    assert(!CompareOps.compare(a, b).columns("k"))
  }

  test("keyedDiff: added/removed/changed with per-column attribution") {
    val old = Seq(
      (1L, "a", Some(10.0)), (2L, "b", Some(20.0)),
      (3L, "c", Some(30.0)), (4L, "d", None)).toDF("k", "name", "bal")
    val newer = Seq(
      (1L, "a", Some(10.0)), // unchanged
      (2L, "B", Some(25.0)), // both columns changed
      (4L, "d", Some(40.0)), // null → value counts as a change
      (5L, "e", Some(50.0))) // added
      .toDF("k", "name", "bal") // key 3 removed
    val rows = CompareOps.keyedDiff(old, newer, Seq("k"))
      .orderBy("k").collect()
    val byK = rows.map(r => r.getLong(0) ->
      (r.getString(1), Option(r.getString(2)))).toMap
    assert(!byK.contains(1L)) // unchanged excluded by default
    assert(byK(2L) == ("changed", Some("bal,name"))) // name-sorted
    assert(byK(3L) == ("removed", None))
    assert(byK(4L) == ("changed", Some("bal")))
    assert(byK(5L) == ("added", None))
    // includeUnchanged surfaces key 1 with an empty attribution
    val all = CompareOps.keyedDiff(old, newer, Seq("k"), includeUnchanged = true)
      .filter(col("k") === 1L).head()
    assert(all.getString(1) == "unchanged" && all.getString(2) == "")
    // type-changed columns are excluded from the comparison set
    val retyped = newer.withColumn("bal", col("bal").cast("string"))
    val r1 = CompareOps.keyedDiff(old, retyped, Seq("k"), includeUnchanged = true)
      .filter(col("k") === 4L).head()
    assert(r1.getString(1) == "unchanged") // only `name` compared
  }
}

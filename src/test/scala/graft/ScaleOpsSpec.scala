package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleOps
import graft.streaming.EventStream

class ScaleOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join matches plain join on skewed data") {
    // one hot key with 10k rows, plus a long tail
    val skewed = (Seq.fill(10000)(1) ++ (2 to 100)).toDF("k")
      .withColumn("v", col("k") * 2)
    val dim = (1 to 100).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).groupBy("k").count()
    val salted = ScaleOps.saltedJoin(skewed, dim, Seq("k")).groupBy("k").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join left semantics preserve unmatched rows") {
    val skewed = Seq(1, 1, 2, 3).toDF("k")
    val dim = Seq((1, "a")).toDF("k", "name")
    val out = ScaleOps.saltedJoin(skewed, dim, Seq("k"), saltFactor = 4, joinType = "left")
    assert(out.count() == 4)
    assert(out.filter($"name".isNull).count() == 2)
  }

  test("salted two-phase aggregation matches direct groupBy") {
    val df = (Seq.fill(5000)(("hot", 1.0)) ++ Seq(("a", 2.0), ("b", 3.0))).toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("count_all"), sum("v").as("sum_v"))
    val salted = ScaleOps.saltedCountSum(df, Seq("k"), Seq("v"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("bucketed table round-trips and joins without exchange on the bucketed side") {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_test")
    // the metastore is per-JVM but the warehouse dir persists across runs —
    // clear any orphaned location from a previous test JVM
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_bucket_test")
    if (warehouse.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(warehouse)
    }
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    ScaleOps.writeBucketed(df, "graft_bucket_test", Seq("id"), numBuckets = 4)
    val back = ScaleOps.readTable(spark, "graft_bucket_test")
    assert(back.count() == 1000)
    // self-join on the bucket key: bucketed scan sides need no shuffle
    val joined = back.join(ScaleOps.readTable(spark, "graft_bucket_test")
      .withColumnRenamed("v", "v2"), Seq("id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(joined.count() == 1000)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("sessionization: gap splits sessions, aggregates per session") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0),  // session 1 (gap 30 → same)
      (1L, ts(60), 3.0),                     // session 2
      (2L, ts(5), 4.0))                      // user 2, one session
      .toDF("user_id", "ts", "value")
    val s = EventStream.sessionize(events, gapMinutes = 30).orderBy("user_id", "session_start")
    val rows = s.collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("n_events") == 2 && rows(0).getAs[Double]("session_value") == 3.0)
    assert(rows(1).getAs[Long]("n_events") == 1 && rows(1).getAs[Double]("session_value") == 3.0)
    assert(rows(2).getAs[Long]("user_id") == 2L)
  }

  test("sessionization on real events produces sane sessions") {
    val events = graft.sources.EventsSource.read(spark, sf("events"))
    val s = EventStream.sessionize(events, gapMinutes = 60)
    val total = s.agg(sum("n_events")).head().getLong(0)
    assert(total == events.count()) // every event lands in exactly one session
  }

  test("bloom-prefiltered join equals the plain join exactly") {
    val orders = spark.read.parquet(sf("orders"))
    val hot = spark.read.parquet(sf("customer"))
      .filter($"c_acctbal" > 9000).select("c_custkey", "c_name")
    val plain = orders.join(hot, orders("o_custkey") === hot("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val bloomed = ScaleOps.bloomPrefilteredJoin(orders, "o_custkey", hot, "c_custkey",
        expectedItems = 10000L)
      .select("o_orderkey", "c_custkey")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("bloom prefilter actually rejects non-matching rows before the join") {
    val big = (1 to 100000).toDF("k")
    val small = Seq(7, 42).toDF("j")
    val bloom = ScaleOps.buildBloom(small, "j", expectedItems = 100L).get
    val kept = big.filter(ScaleOps.mightContain(bloom, $"k")).count()
    // 2 true positives + ~fpp * 100k false positives; at 3% target with a
    // 100-item-sized filter the FP count is far below 1% of the input
    assert(kept >= 2 && kept < 5000, s"bloom rejected too little: kept $kept of 100000")
  }

  test("empty small side yields an empty join, not a crash") {
    val big = (1 to 10).toDF("k")
    val small = Seq.empty[Int].toDF("j")
    assert(ScaleOps.buildBloom(small, "j").isEmpty)
    assert(ScaleOps.bloomPrefilteredJoin(big, "k", small, "j").isEmpty)
  }

  test("bloom prefilter rejects outer join types") {
    val df = Seq(1).toDF("k")
    intercept[IllegalArgumentException] {
      ScaleOps.bloomPrefilteredJoin(df, "k", df, "k", joinType = "left")
    }
  }

  test("keySkewReport: counts, percentiles and skew ratio on a known layout") {
    // key 1 → 6 rows, keys 2..5 → 1 row each: n_keys=5, n_rows=10, max=6,
    // mean=2, p50 = interpolated median of {1,1,1,1,6} = 1
    val df = (Seq.fill(6)(1) ++ (2 to 5)).toDF("k")
    val r = ScaleOps.keySkewReport(df, Seq("k")).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 1.0) // mean, p50
    assert(r.getDouble(7) == 3.0) // skew = 6 / 2
  }

  test("heavyHitters returns top keys by count with shares, bounded") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq("d", "e")).toDF("k")
    val hh = ScaleOps.heavyHitters(df, Seq("k"), k = 2).collect()
    assert(hh.length == 2)
    assert(hh(0).getString(0) == "a" && hh(0).getLong(1) == 50L
      && hh(0).getDouble(2) == 0.490196)
    assert(hh(1).getString(0) == "b" && hh(1).getLong(1) == 30L)
  }

  test("joinFanoutReport predicts the exact inner-join output size") {
    val left = (Seq(1, 1, 1, 2, 3)).toDF("k")   // counts: 1→3, 2→1, 3→1
    val right = (Seq(1, 1, 2, 4)).toDF("k")     // counts: 1→2, 2→1, 4→1
    val r = ScaleOps.joinFanoutReport(left, right, Seq("k")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    val actual = left.join(right, Seq("k")).count()
    assert(r.getLong(3) == actual && actual == 7L) // 3*2 + 1*1
    assert(r.getLong(4) == 6L) // key 1 fanout
  }

  test("bloom predicate stays codegen'd in the scan stage (no exchange before filter)") {
    val big = spark.read.parquet(sf("orders"))
    val small = spark.read.parquet(sf("customer")).filter($"c_acctbal" > 9000)
    val bloom = ScaleOps.buildBloom(small, "c_custkey", expectedItems = 10000L).get
    val filtered = big.filter(ScaleOps.mightContain(bloom, $"o_custkey"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom predicate in plan:\n$plan")
    assert(!plan.contains("Exchange"), s"prefilter must run scan-side:\n$plan")
  }

  test("heavyHittersSketch: exact mode (capacity >= cardinality) equals groupBy") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(5)("d")).toDF("k").repartition(7) // multi-partition: merge path runs
    val out = ScaleOps.heavyHittersSketch(df, "k", k = 3, capacity = 16)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, "a", 50L, 0L), (2, "b", 30L, 0L), (3, "c", 20L, 0L)))
  }

  test("heavyHittersSketch: under eviction the heavy key survives with valid bounds") {
    // one dominant key among many singletons, tiny capacity, one partition
    // (deterministic eviction order for the assertion on bounds)
    val df = (Seq.fill(100)("hot") ++ (1 to 60).map(i => s"cold_$i"))
      .toDF("k").coalesce(1)
    val out = ScaleOps.heavyHittersSketch(df, "k", k = 1, capacity = 8)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    // hot's true count is 100: count is an upper bound, count - err a lower
    assert(out._1 == "hot" && out._2 >= 100L && out._2 - out._3 <= 100L)
  }

  test("heavyHittersSketch: null keys are not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("k")
    val out = ScaleOps.heavyHittersSketch(df, "k", k = 5, capacity = 8)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("rangeBucketExpr: monotone asc/desc, null and NaN placement") {
    val splits = Array(10.0, 20.0, 30.0)
    val df = Seq(Some(5.0), Some(10.0), Some(15.0), Some(25.0), Some(35.0),
      None, Some(Double.NaN)).toDF("v")
    def buckets(desc: Boolean, nullsFirst: Boolean): Seq[Int] =
      df.select(ScaleOps.rangeBucketExpr(splits, col("v"), desc, nullsFirst)
        .as("b")).collect().map(_.getInt(0)).toSeq
    // asc nulls-first: null→0 with the smallest; NaN greatest → last
    assert(buckets(desc = false, nullsFirst = true) ==
      Seq(0, 1, 1, 2, 3, 0, 3))
    // desc nulls-last: largest→0, null→len with the smallest; NaN→0
    assert(buckets(desc = true, nullsFirst = false) ==
      Seq(3, 2, 2, 1, 0, 3, 0))
    // bucket order must agree with sort order: sort rows, buckets must be
    // non-decreasing, and ties on value always share a bucket
    val asc = df.na.drop().orderBy(col("v"))
      .select(ScaleOps.rangeBucketExpr(splits, col("v")).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(asc == asc.sorted)
  }

  test("withExclusiveRunningSum equals the global-window cumsum, asc and desc") {
    val perV = (1 to 200).map(i => (i * 3 % 97, (i % 5) + 1L))
      .groupBy(_._1).map { case (v, xs) => (v.toDouble, xs.map(_._2).sum) }
      .toSeq.toDF("v", "c").repartition(4)
    def windowed(desc: Boolean): Map[Double, Long] = {
      import org.apache.spark.sql.expressions.Window
      val o = if (desc) col("v").desc else col("v").asc
      perV.withColumn("x", coalesce(sum(col("c")).over(
          Window.orderBy(o).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    }
    val gotAsc = ScaleOps.withExclusiveRunningSum(perV, col("v"), "c", "x")
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    assert(gotAsc == windowed(desc = false))
    val gotDesc = ScaleOps.withExclusiveRunningSum(perV, col("v").desc, "c", "x")
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    assert(gotDesc == windowed(desc = true))
    spark.catalog.clearCache()
  }

  test("withExclusiveRunningSum: empty input yields empty output, no crash") {
    val perV = Seq.empty[(Double, Long)].toDF("v", "c")
    assert(ScaleOps.withExclusiveRunningSum(perV, col("v"), "c", "x").count() == 0)
    spark.catalog.clearCache()
  }

  test("rankCutpoints: naive expansion reference, boundaries, ties, empties") {
    // heavy ties, multiple values per count row — compare against sorting
    // the fully-expanded multiset
    val counts = Seq((5.0, 3L), (1.0, 4L), (9.0, 1L), (3.0, 2L))
      .toDF("v", "c").repartition(3)
    val expanded = Seq.fill(4)(1.0) ++ Seq.fill(2)(3.0) ++
      Seq.fill(3)(5.0) ++ Seq(9.0) // sorted, n = 10
    def naive(ranks: Seq[Long]): Seq[Double] =
      ranks.map(r => expanded((r - 1).toInt)).distinct.sorted
    // boundary ranks 1 and n; a mid-tie rank; duplicate targets collapse
    val (n1, cuts1) = ScaleOps.rankCutpoints(counts, "v", "c",
      _ => Seq(1L, 2L, 5L, 6L, 10L, 10L))
    assert(n1 == 10L)
    assert(cuts1 == naive(Seq(1L, 2L, 5L, 6L, 10L)),
      s"got $cuts1 vs ${naive(Seq(1L, 2L, 5L, 6L, 10L))}")
    // out-of-range targets are dropped, not errors
    val (_, cuts2) = ScaleOps.rankCutpoints(counts, "v", "c",
      _ => Seq(-3L, 0L, 4L, 11L, 99L))
    assert(cuts2 == Seq(1.0), s"got $cuts2")
    // the shared decile spine agrees with the naive expansion
    val (_, cutsD) = ScaleOps.rankCutpoints(counts, "v", "c",
      ScaleOps.quantileRanks(4))
    val qr = ScaleOps.quantileRanks(4)(10L) // ceil(i*10/4) = 3, 5, 8
    assert(qr == Seq(3L, 5L, 8L))
    assert(cutsD == naive(qr))
    // empty input
    val empty = Seq.empty[(Double, Long)].toDF("v", "c")
    assert(ScaleOps.rankCutpoints(empty, "v", "c", _ => Seq(1L)) ==
      ((0L, Seq.empty[Double])))
    // no targets requested
    assert(ScaleOps.rankCutpoints(counts, "v", "c", _ => Seq.empty) ==
      ((10L, Seq.empty[Double])))
    spark.catalog.clearCache()
  }

  test("footerRangeSplits: parquet scan yields zero-job splits; memory df does not") {
    val orders = spark.read.parquet(sf("orders"))
      .select(col("o_custkey"), col("o_orderkey"))
    val splits = ScaleOps.footerRangeSplits(orders, "o_custkey")
    assert(splits.isDefined && splits.get.nonEmpty,
      "expected footer-derived splits for a plain parquet scan")
    assert(splits.get.toSeq == splits.get.toSeq.sorted)
    // a filter cannot invalidate the bounds — still Some
    assert(ScaleOps.footerRangeSplits(
      orders.filter(col("o_orderkey") > 100), "o_custkey").isDefined)
    // aliased monotone cast traces through; a computed column must not
    val casted = orders.select(col("o_custkey").cast("double").as("ck"))
    assert(ScaleOps.footerRangeSplits(casted, "ck").isDefined)
    val computed = orders.select((col("o_custkey") * 2).as("ck"))
    assert(ScaleOps.footerRangeSplits(computed, "ck").isEmpty)
    // in-memory data has no footers
    assert(ScaleOps.footerRangeSplits(Seq(1.0, 2.0).toDF("v"), "v").isEmpty)
    // multi-file layout: range = union of per-file footer ranges
    val multi = tmpDir("footer_multi") + "/t"
    (1 to 3000).map(_.toDouble).toDF("x").repartition(3).write.parquet(multi)
    val ms = ScaleOps.footerRangeSplits(spark.read.parquet(multi), "x")
    assert(ms.isDefined && ms.get.head > 1.0 && ms.get.last < 3000.0)
    // grouping column of an aggregate keeps the child relation's bounds
    val grouped = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    assert(ScaleOps.footerRangeSplits(grouped, "o_custkey").isDefined)
  }

  test("footerRangeSplits traces through Union — tall concat keeps the zero-job path") {
    // two parquet files with DISJOINT ranges; their union's footer range
    // must be the min/max over both children, derived with ZERO Spark jobs
    val dirA = tmpDir("footer_union_a") + "/t"
    val dirB = tmpDir("footer_union_b") + "/t"
    (1 to 1000).map(_.toDouble).toDF("v").coalesce(1).write.parquet(dirA)
    (5000 to 9000).map(_.toDouble).toDF("v").coalesce(1).write.parquet(dirB)
    val unioned = spark.read.parquet(dirA).unionByName(spark.read.parquet(dirB))

    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val splits = ScaleOps.footerRangeSplits(unioned, "v")
      // listener events are queued — give the bus a moment to drain
      Thread.sleep(500)
      assert(jobs == 0, s"footer path must launch zero jobs, saw $jobs")
      assert(splits.isDefined, "union of two parquet scans must trace")
      assert(splits.get.head > 1.0 && splits.get.last < 9000.0 &&
        splits.get.exists(_ > 1000.0),
        "splits must span the COMBINED range of both children")
    } finally spark.sparkContext.removeSparkListener(listener)

    // cumsum over the unioned input stays correct on the footer path
    val perV = unioned.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val out = ScaleOps.withExclusiveRunningSum(perV, col("v"), "c", "x",
      persistInput = false)
    val got = out.orderBy(col("v")).select(col("x"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == (0L until (1000L + 4001L)),
      "exclusive running sum over the union must be 0..n-1")

    // a union with an UNTRACEABLE child (in-memory) must NOT half-bound
    val mixed = spark.read.parquet(dirA)
      .unionByName(Seq(42.0).toDF("v"))
    assert(ScaleOps.footerRangeSplits(mixed, "v").isEmpty,
      "a partial range does not bound the union")
    spark.catalog.clearCache()
  }

  test("countMin: one-sided guarantee, exactness when wide, collisions when narrow") {
    import org.apache.spark.sql.functions._
    val data = (1 to 60).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("key")
    val exact = data.groupBy(col("key")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = exact.keys.toSeq.toDF("key")
    // wide sketch: 60 keys in 4x2048 buckets — everything exact
    val wide = ScaleOps.countMinEstimates(
      ScaleOps.countMinCells(data, "key", depth = 4, width = 2048),
      keys, "key", depth = 4, width = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == exact, "wide sketch must be collision-free here")
    // narrow sketch: overestimates allowed, undercounts NEVER
    val narrow = ScaleOps.countMinEstimates(
      ScaleOps.countMinCells(data, "key", depth = 4, width = 8),
      keys, "key", depth = 4, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(narrow(k) >= c, s"CMS undercounted $k: ${narrow(k)} < $c")
    }
    assert(narrow.exists { case (k, c) => c > exact(k) },
      "8 buckets over 60 keys must collide somewhere")
    // a key never inserted still answers (collision mass only)
    val ghost = ScaleOps.countMinEstimates(
      ScaleOps.countMinCells(data, "key", depth = 4, width = 8),
      Seq("never-seen").toDF("key"), "key", depth = 4, width = 8)
      .collect().head.getLong(1)
    assert(ghost >= 0)
  }

  test("kmvDistinct: exact below k, accurate above k, duplicate-invariant") {
    // below k the minima set IS the distinct set
    val small = (1 to 10).map(i => s"key$i").toDF("id")
    val r = ScaleOps.kmvDistinct(small, "id", k = 16).collect().head
    assert(r.getAs[Long]("n_kept") == 10L)
    assert(r.getAs[Double]("estimate") == 10.0)
    // above k: deterministic md5 sketch, estimate within the sketch's
    // noise band (rel std ~ 1/sqrt(k-2) ~ 6% at k=256; assert 4 sigma)
    val big = (1 to 5000).map(i => s"user-$i").toDF("id")
    val rb = ScaleOps.kmvDistinct(big, "id", k = 256).collect().head
    assert(rb.getAs[Long]("n_kept") == 256L)
    val est = rb.getAs[Double]("estimate")
    assert(math.abs(est - 5000) < 0.25 * 5000, s"estimate $est vs 5000")
    // multiplicity must not move the sketch — distinct hashes only
    val dup = (1 to 5000).flatMap(i => Seq.fill(3)(s"user-$i")).toDF("id")
    val rd = ScaleOps.kmvDistinct(dup, "id", k = 256).collect().head
    assert(rd.getAs[Double]("estimate") == est)
  }
}

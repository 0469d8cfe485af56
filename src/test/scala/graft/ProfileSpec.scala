package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.profile.{ColumnProfiler, ProfileComparison}

/** Mirrors /root/reference/test/profile/ semantics. */
class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1.0), "a"), (Some(2.0), "b"), (Some(3.0), "a"), (None, "c"))
    .toDF("v", "s")

  test("profile computes the compared metric set") {
    val p = ColumnProfiler.profile(df).variables
    val v = p("v")
    assert(v.n == 4 && v.nMissing == 1 && math.abs(v.pMissing - 0.25) < 1e-12)
    assert(v.nDistinct == 3)
    assert(math.abs(v.mean.get - 2.0) < 1e-12)
    assert(math.abs(v.std.get - 1.0) < 1e-12)
    assert(v.min.get == 1.0 && v.max.get == 3.0)
    val s = p("s")
    assert(s.nDistinct == 3 && s.mean.isEmpty && s.min.contains("a"))
  }

  test("NaN counts as missing for doubles") {
    val d = Seq(1.0, Double.NaN, 3.0).toDF("v")
    assert(ColumnProfiler.profile(d).variables("v").nMissing == 1)
  }

  test("NaN is excluded from value stats, consistent with n_missing") {
    val d = Seq(1.0, Double.NaN, 3.0).toDF("v")
    val p = ColumnProfiler.profile(d).variables("v")
    assert(p.mean.contains(2.0))
    assert(p.max.contains(3.0)) // raw max would be NaN (sorts greatest)
    assert(p.min.contains(1.0))
    assert(p.nDistinct == 2) // pandas nunique: NaN not a value
    assert(!p.std.get.isNaN)
  }

  test("histogram bins: exact fixed-width counts, edges at data min/max") {
    // values chosen so buckets are unambiguous: width = 9/10 = 0.9
    val d = Seq(0.0, 0.0, 1.0, 5.0, 9.0, 9.0, 9.0).toDF("x")
    val v = ColumnProfiler.profile(d, exactDistinct = true).variables("x")
    assert(v.histLo.contains(0.0) && v.histHi.contains(9.0))
    // 0,0 -> bin 0; 1 -> floor(1/9*10)=1; 5 -> floor(5.55)=5; 9 -> clamps to 9
    assert(v.hist.contains(Seq(2L, 1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L, 3L)))
    assert(v.hist.get.sum == 7L) // every non-null value lands in a bin

    // constant column: single occupied bin, no division blowup
    val const = Seq(4.0, 4.0, 4.0).toDF("x")
    val cv = ColumnProfiler.profile(const, exactDistinct = true).variables("x")
    assert(cv.hist.contains(Seq(3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))

    // nulls and NaN are excluded, matching n_missing semantics
    val withNulls = Seq(Some(0.0), None, Some(Double.NaN), Some(9.0)).toDF("x")
    val nv = ColumnProfiler.profile(withNulls, exactDistinct = true).variables("x")
    assert(nv.hist.get.sum == 2L)

    // approx (single-pass 100 TB) mode — the DEFAULT — has no second scan
    // and no histogram
    val ap = ColumnProfiler.profile(d).variables("x")
    assert(ap.hist.isEmpty)

    // the HTML report renders the bins as an inline SVG
    val html = graft.profile.ProfileReport.toHtml(
      ColumnProfiler.profile(d, exactDistinct = true))
    assert(html.contains("histsvg") && html.contains("<rect"))
  }

  test("correlations: one-pass pairwise Pearson, constant column → null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0), (4.0, 7.9, 5.0))
      .toDF("x", "y", "const")
    val rows = graft.profile.ColumnProfiler.correlations(df, Some(Seq("x", "y", "const")))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // near-perfect linear relation
    assert(rows(("x", "y")).get > 0.999)
    // constant column: correlation undefined → null
    assert(rows(("x", "const")).isEmpty && rows(("y", "const")).isEmpty)
    // exactly one scan: the plan has a single aggregate over one relation
    val plan = graft.profile.ColumnProfiler.correlations(df, Some(Seq("x", "y", "const")))
      .queryExecution.executedPlan.toString
    assert("Scan".r.findAllIn(plan).size <= 2, s"expected one scan:\n$plan") // partial+final rows
    // validation errors
    intercept[IllegalArgumentException] {
      graft.profile.ColumnProfiler.correlations(df, Some(Seq("x", "nope"))).collect()
    }
    // html section renders a symmetric matrix with unit diagonal
    val html = graft.profile.ProfileReport.correlationsHtml(Seq(
      ("x", "y", Some(0.9876)), ("x", "const", None), ("y", "const", None)))
    assert(html.contains("Correlations") && html.contains("1"))
  }

  test("column-batched profiling merges to the same result") {
    val whole = ColumnProfiler.profile(df)
    val merged = ColumnProfiler.profile(df, Some(Seq("v")))
      .merge(ColumnProfiler.profile(df, Some(Seq("s"))))
    assert(merged.variables == whole.variables)
  }

  test("comparison statuses: equal, different, missing, type mismatch") {
    val a = ColumnProfiler.profile(Seq((1.0, "x", 1L)).toDF("same", "gone", "typed"))
    val b = ColumnProfiler.profile(Seq((1.0, 2.0)).toDF("same", "typed"))
    val s = ProfileComparison.compare(Seq(a, b), Seq("a", "b"))
    assert(s.columns("same").status == "equal")
    assert(s.columns("gone").status == "missing_in_some")
    assert(s.columns("typed").status == "type_mismatch")
    assert(s.overview.totalColumns == 3)
    assert(s.changedColumns == Seq("gone", "typed"))
  }

  test("tolerances absorb small deltas; rel delta inf when baseline 0") {
    val a = ColumnProfiler.profile(Seq(0.0, 0.0).toDF("v"))
    val b = ColumnProfiler.profile(Seq(0.05, -0.05).toDF("v"))
    val strict = ProfileComparison.compare(Seq(a, b), Seq("a", "b"))
    assert(strict.columns("v").status == "different")
    // baseline mean = 0, new mean = 0 → equal; but std differs: 0 vs ~0.07
    val tolerant = ProfileComparison.compare(Seq(a, b), Seq("a", "b"), absTol = 1.0)
    assert(tolerant.columns("v").status == "equal")
    // rel = inf when baseline is 0 and delta nonzero
    val std = strict.columns("v").metrics("std")
    assert(std.deltasFromFirst(1).exists(_._2.isPosInfinity))
  }

  test("NaN == NaN is within tolerance") {
    assert(ProfileComparison.withinTolerance(
      Some(Double.NaN), Some(Double.NaN), 0.0, 0.0))
    assert(!ProfileComparison.withinTolerance(Some(Double.NaN), Some(1.0), 0.0, 0.0))
  }

  test("json export round-trips through a parser") {
    val a = ColumnProfiler.profile(df)
    val b = ColumnProfiler.profile(df.filter($"s" =!= "c"))
    val json = ProfileComparison.toJson(ProfileComparison.compare(Seq(a, b), Seq("a", "b")))
    assert(json.contains("\"overview\"") && json.contains("\"tolerance\""))
    // sanity: it parses as JSON (driver-side python will do the same)
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("profileFile fills memorySize from exact footer byte counts") {
    val p = graft.profile.ColumnProfiler.profileFile(spark, sf("lineitem"),
      Some(Seq("l_quantity", "l_returnflag")))
    assert(p.variables("l_quantity").memorySize > 0)
    assert(p.variables("l_returnflag").memorySize > 0)
    assert(p.variables("l_quantity").n == 6000)
  }

  test("profile of real lineitem matches direct SQL aggregates") {
    val li = spark.read.parquet(sf("lineitem"))
    val p = ColumnProfiler.profile(li, Some(Seq("l_quantity")),
      exactDistinct = true).variables("l_quantity")
    val expected = li.selectExpr("avg(l_quantity)", "count(distinct l_quantity)").head()
    assert(math.abs(p.mean.get - expected.getDouble(0)) < 1e-9)
    assert(p.nDistinct == expected.getLong(1))
  }

  test("quartiles: exact interpolated values, NaN/null excluded") {
    import spark.implicits._
    // 1..4 with a null and a NaN: quartiles over {1,2,3,4} linearly
    // interpolated -> p25=1.75, p50=2.5, p75=3.25
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None, Some(Double.NaN))
      .toDF("v")
    val p = ColumnProfiler.profile(df, exactDistinct = true).variables("v")
    assert(p.p25.get == 1.75 && p.p50.get == 2.5 && p.p75.get == 3.25)
    // approx mode (the default) still produces quartiles (sketch-based)
    val a = ColumnProfiler.profile(df).variables("v")
    assert(a.p50.get >= 2.0 && a.p50.get <= 3.0)
    // non-numeric columns carry no quartiles
    val s = ColumnProfiler.profile(Seq("x").toDF("t")).variables("t")
    assert(s.p25.isEmpty && s.p50.isEmpty && s.p75.isEmpty)
  }

  test("exact profile of non-decimal numerics is one aggregation, no Expand") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val real = spark.read.parquet(sf("lineitem"))
    val cols = Some(Seq("l_quantity", "l_extendedprice", "l_discount"))
    ColumnProfiler.profile(real, cols) // warm (FS listing etc.)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { counter.incrementAndGet(); () }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          plans.add(s.physicalPlanDescription); ()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ColumnProfiler.profile(real, cols)
      Thread.sleep(500)
      // one aggregation query = at most 2 AQE stage-jobs (partial + final);
      // the pre-kernel shape (count_distinct pass + percentile pass) ran 4
      assert(counter.get() <= 2,
        s"exact profile ran ${counter.get()} jobs — kernel fusion must keep it to one query")
      assert(plans.asScala.forall(p => !p.contains("Expand")),
        "exact profile must not plan an Expand (count_distinct is fused into the kernel)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("exact timestamp distincts survive a DST wall-clock collision") {
    // 2025-11-02 01:30 happens twice in America/Los_Angeles (PDT then PST):
    // cast-to-string maps both instants to the same wall-clock text, so a
    // stringified-cast distinct key would undercount — the profiler keys
    // timestamps by unix_micros instead
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val ts = spark.sql(
        """SELECT timestamp_seconds(s) AS t
          |FROM VALUES (1762072200L), (1762075800L) AS v(s)""".stripMargin)
      // precondition: the two instants really do collide as strings here
      val strs = ts.selectExpr("cast(t as string)").distinct().count()
      assert(strs == 1L, s"expected a wall-clock collision, got $strs strings")
      val p = ColumnProfiler.profile(ts).variables("t")
      assert(p.nDistinct == 2L,
        s"distinct instants must not merge across the DST fold: ${p.nDistinct}")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("winsorize clamps into the quantile range, other columns untouched") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble, s"r$i")).toDF("id", "v", "tag")
    val out = ColumnProfiler.winsorize(df, Seq("v"), lower = 0.10, upper = 0.90)
    assert(out.columns.toSeq == Seq("id", "v", "tag")) // names/order preserved
    val vs = out.select("v").collect().map(_.getDouble(0))
    // exact interpolated p10/p90 of 1..100 are 10.9 and 90.1
    assert(math.abs(vs.min - 10.9) < 1e-9 && math.abs(vs.max - 90.1) < 1e-9)
    // interior values pass through unchanged
    assert(out.filter(col("id") === 50L).head().getDouble(1) == 50.0)
    assert(out.filter(col("id") === 1L).head().getString(2) == "r1")
    // approx mode lands within a loose band of the same boundaries
    val approx = ColumnProfiler.winsorize(df, Seq("v"), 0.10, 0.90, exact = false)
      .select("v").collect().map(_.getDouble(0))
    assert(approx.min >= 1.0 && approx.min <= 20.0 && approx.max >= 80.0)
    intercept[IllegalArgumentException] {
      ColumnProfiler.winsorize(df, Seq("tag"))
    }
    intercept[IllegalArgumentException] {
      ColumnProfiler.winsorize(df, Seq("v"), lower = 0.5, upper = 0.4)
    }
  }

  test("madOutliers: robust z flags the spike, degenerate MAD flags nothing") {
    // median 10, deviations {0,0,1,1,90} → MAD 1; z(100) = 90/1.4826 ≈ 60.7
    val df = Seq(10.0, 10.0, 9.0, 11.0, 100.0).toDF("v")
    val rows = ColumnProfiler.madOutliers(df, "v", k = 3.5)
      .orderBy("v").collect()
    val flagged = rows.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.map(_.getDouble(0)).toSeq == Seq(100.0))
    val z = flagged.head.getAs[Double]("robust_z")
    assert(math.abs(z - 90.0 / 1.4826) < 1e-9)
    // inliers score small
    assert(rows.filter(_.getDouble(0) == 10.0).forall(_.getAs[Double]("robust_z") == 0.0))
    // MAD = 0 (constant majority): nothing flagged, null scores
    val const = Seq(5.0, 5.0, 5.0, 9.0).toDF("v")
    val c = ColumnProfiler.madOutliers(const, "v").collect()
    assert(c.forall(!_.getAs[Boolean]("is_outlier")))
    assert(c.forall(_.isNullAt(c.head.fieldIndex("robust_z"))))
    intercept[IllegalArgumentException] {
      ColumnProfiler.madOutliers(df, "v", k = 0.0)
    }
  }

  test("profileByGroup: per-group stats in long form, NaN counts missing") {
    val df = Seq(
      ("a", Some(1.0), 10L), ("a", Some(3.0), 20L),
      ("a", Some(Double.NaN), 30L),
      ("b", Some(5.0), 40L), ("b", None, 40L)).toDF("g", "v", "w")
    val rows = ColumnProfiler.profileByGroup(df, "g", Seq("v", "w"))
      .orderBy("group", "column_name").collect()
    assert(rows.length == 4) // 2 groups x 2 columns
    val av = rows(0)
    assert(av.getAs[String]("group") == "a" && av.getAs[String]("column_name") == "v")
    assert(av.getAs[Long]("n") == 3L && av.getAs[Long]("n_missing") == 1L)
    assert(av.getAs[Long]("n_distinct") == 2L)
    assert(av.getAs[Double]("mean") == 2.0) // NaN excluded from stats
    assert(av.getAs[Double]("min") == 1.0 && av.getAs[Double]("max") == 3.0)
    val bw = rows(3)
    assert(bw.getAs[String]("group") == "b" && bw.getAs[String]("column_name") == "w")
    assert(bw.getAs[Long]("n_distinct") == 1L && bw.getAs[Long]("n_missing") == 0L)
    // one aggregation: the plan has exactly one shuffle for the groupBy
    val plan = ColumnProfiler.profileByGroup(df, "g", Seq("v", "w"),
      exactDistinct = false).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected one shuffle:\n$plan")
  }

  test("quantileBins: equal-population buckets from interpolated quartiles") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = ColumnProfiler.quantileBins(df, "v", k = 4)
    assert(out.columns.contains("v_bucket"))
    val counts = out.groupBy("v_bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // quartiles of 1..100: 25.75 / 50.5 / 75.25 -> buckets of 25 each
    assert(counts == Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
    // boundary goes to the LOWER bucket (v <= q)
    val b25 = out.filter(col("id") === 25L).head().getInt(2)
    assert(b25 == 1)
    intercept[IllegalArgumentException] {
      ColumnProfiler.quantileBins(df, "v", k = 1)
    }
  }


  test("percentilesByGroup: interpolated quantiles per group, long form") {
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i * 10.0))).toDF("g", "v")
    val out = ColumnProfiler.percentilesByGroup(df, "g", "v", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 0.5)) == 50.5 && math.abs(out(("a", 0.9)) - 90.1) < 1e-9)
    assert(out(("b", 0.5)) == 55.0) // interpolated between 50 and 60
    assert(out.size == 4)
  }


  test("percentileRank: cume_dist per group with shared tie ranks") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0), ("b", 7.0))
      .toDF("g", "v")
    val out = ColumnProfiler.percentileRank(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 1.0)) == 0.25)
    assert(out(("a", 2.0)) == 0.75) // both ties share 3/4
    assert(out(("a", 4.0)) == 1.0 && out(("b", 7.0)) == 1.0)
  }

  test("minMaxScale: [0,1] per group, constant group scales to 0, nulls pass") {
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", None),
      ("b", Some(5.0)), ("b", Some(5.0))).toDF("g", "v")
    val out = ColumnProfiler.minMaxScale(df, Seq("g"), Seq("v"))
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.toString).getOrElse("null"),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    val m = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("a", "10.0")) == 0.0 && m(("a", "20.0")) == 1.0)
    assert(m(("a", "null")) == null)
    assert(m(("b", "5.0")) == 0.0) // constant group
  }

  test("robustZByGroup: group-local scale; degenerate MAD yields null") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val out = ColumnProfiler.robustZByGroup(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    // a: median 2.5, MAD = median(|v-2.5|) = median(1.5,0.5,0.5,97.5) = 1.0
    assert(math.abs(out(("a", 100.0)).doubleValue - (97.5 / 1.4826)) < 1e-6)
    assert(out(("b", 5.0)) == null) // constant group: MAD 0 -> null
  }

  test("the bounded-memory HLL mode is the DEFAULT profiling mode") {
    import spark.implicits._
    // plan-level: a default profileByGroup aggregates with
    // approx_count_distinct (fixed-size HLL buffers), never the exact
    // set-buffer kernel (per-distinct-value memory) — the safe default
    // for a table of unknown cardinality
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val defPlan = ColumnProfiler.profileByGroup(df, "g", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(defPlan.contains("approx_count_distinct"), s"default not HLL:\n$defPlan")
    assert(!defPlan.contains("distinct_count_set"), s"default uses exact kernel:\n$defPlan")
    // exact mode stays opt-in
    val exPlan = ColumnProfiler.profileByGroup(df, "g", Seq("v"),
      exactDistinct = true).queryExecution.executedPlan.toString
    assert(!exPlan.contains("approx_count_distinct"))
    // behavior-level: at high cardinality the default count is an HLL
    // estimate (not exact), while exactDistinct = true is exact — the two
    // modes are genuinely different paths, so the default really is HLL
    val wide = (0 until 60000).map(i => s"id_$i").toDF("s")
    val approx = ColumnProfiler.profile(wide).variables("s").nDistinct
    val exact = ColumnProfiler.profile(wide, exactDistinct = true)
      .variables("s").nDistinct
    assert(exact == 60000L)
    // the estimate only needs to land within HLL tolerance — asserting it
    // differs from the true count would break if a future sketch happened
    // to land exactly (the mode split is already pinned at plan level)
    assert(math.abs(approx - 60000L) < 6000,
      s"expected an HLL estimate near 60000, got $approx")
  }

  test("categoricalAssociation: hand-computed chi2, Cramer's V and MI on a 2x2") {
    // contingency [[2,1],[0,1]]: chi2 = n(ad-bc)^2/((a+b)(c+d)(a+c)(b+d))
    //   = 4*(2*1-1*0)^2 / (3*1*2*2) = 4/3;
    // MI = .5 ln(4/3) + .25 ln(2/3) + .25 ln 2 = 0.2157615...
    // V = sqrt((4/3)/(4*(2-1))) = 1/sqrt(3)
    val df = Seq(("x", "u"), ("x", "v"), ("x", "u"), ("y", "v"))
      .toDF("a", "b")
    val r = graft.profile.Association.categoricalAssociation(df, "a", "b")
      .collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("k_a") == 2L && r.getAs[Long]("k_b") == 2L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0 / 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("cramers_v") - 1.0 / math.sqrt(3.0)) < 1e-9)
    val mi = 0.5 * math.log(4.0 / 3.0) + 0.25 * math.log(2.0 / 3.0) +
      0.25 * math.log(2.0)
    assert(math.abs(r.getAs[Double]("mutual_info") - mi) < 1e-9)
  }

  test("categoricalAssociation: independent columns give chi2 ~ 0, MI ~ 0") {
    // perfectly independent 2x2 (all marginals uniform, o = e everywhere)
    val df = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val r = graft.profile.Association.categoricalAssociation(df, "a", "b")
      .collect().head
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-9)
    assert(math.abs(r.getAs[Double]("mutual_info")) < 1e-9)
    // constant column: V is NULL (min(k)-1 = 0), chi2 still defined
    val c = graft.profile.Association.categoricalAssociation(
      Seq(("x", "u"), ("x", "v")).toDF("a", "b"), "a", "b").collect().head
    assert(c.isNullAt(c.fieldIndex("cramers_v")))
  }

  test("categoricalAssociation matches a naive reference on seeded random tables") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val ka = 1 + rnd.nextInt(4); val kb = 1 + rnd.nextInt(4)
      val rows = Seq.fill(20 + rnd.nextInt(180))(
        (s"a${rnd.nextInt(ka)}", s"b${rnd.nextInt(kb)}"))
      val r = graft.profile.Association
        .categoricalAssociation(rows.toDF("a", "b"), "a", "b").collect().head
      // naive reference over the in-memory rows
      val n = rows.size.toDouble
      val cells = rows.groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val ma = rows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      val mb = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      // keys.toSeq: a Set comprehension would DEDUPE equal chi2 terms
      val chi2 = (for (x <- ma.keys.toSeq; y <- mb.keys.toSeq) yield {
        val e = ma(x) * mb(y) / n
        val o = cells.getOrElse((x, y), 0.0)
        (o - e) * (o - e) / e
      }).sum
      val mi = cells.map { case ((x, y), o) =>
        o / n * math.log(o * n / (ma(x) * mb(y))) }.sum
      assert(r.getAs[Long]("n") == rows.size.toLong, s"trial $trial")
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-7 * (1 + chi2),
        s"trial $trial chi2 ${r.getAs[Double]("chi2")} vs $chi2")
      assert(math.abs(r.getAs[Double]("mutual_info") - mi) < 1e-9,
        s"trial $trial")
      // invariants: MI >= 0 (KL), MI <= min(ln ka, ln kb); V in [0,1] or NULL
      assert(mi >= -1e-12)
      assert(mi <= math.log(math.min(ma.size, mb.size).toDouble) + 1e-9)
      val vIdx = r.fieldIndex("cramers_v")
      if (math.min(ma.size, mb.size) == 1) assert(r.isNullAt(vIdx))
      else {
        val v = r.getDouble(vIdx)
        assert(v >= 0.0 && v <= 1.0 + 1e-9, s"trial $trial V=$v")
      }
    }
  }

  test("associationMatrix: one row per unordered pair, equal to the pairwise op") {
    val df = Seq(("x", "u", 1L), ("x", "v", 2L), ("y", "u", 1L), ("y", "v", 1L))
      .toDF("a", "b", "c")
    val m = graft.profile.Association.associationMatrix(df, Seq("a", "b", "c"))
      .orderBy(col("col_a"), col("col_b")).collect()
    assert(m.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val direct = graft.profile.Association.categoricalAssociation(df, "a", "c")
      .collect().head
    val ac = m.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    // tolerance, not ==: the single-scan matrix sums its cells in a
    // different partition order than the pairwise plan (float addition is
    // non-associative); the statistics agree to well past any report dp
    assert(math.abs(ac.getAs[Double]("chi2") - direct.getAs[Double]("chi2")) < 1e-9)
    assert(math.abs(ac.getAs[Double]("mutual_info") -
      direct.getAs[Double]("mutual_info")) < 1e-9)
  }

  test("associationMatrix: a mixed-type pair keeps cell identity via string cast") {
    // long-typed categorical column: the matrix casts to string internally;
    // distinct longs must stay distinct cells (injective cast)
    val df = Seq(("x", 1L), ("x", 10L), ("y", 1L), ("y", 10L), ("y", 10L))
      .toDF("a", "v")
    val m = graft.profile.Association.associationMatrix(df, Seq("a", "v"))
      .collect().head
    assert(m.getAs[Long]("k_a") == 2L && m.getAs[Long]("k_b") == 2L)
    assert(m.getAs[Long]("n") == 5L)
  }

  test("associationMatrix: a pair with zero co-observed rows keeps a null-stat row") {
    val df = Seq(("x", Some("u"), None: Option[String]),
        ("y", None, Some("w")))
      .toDF("a", "b", "c")
    val m = graft.profile.Association.associationMatrix(df, Seq("a", "b", "c"))
      .orderBy(col("col_a"), col("col_b")).collect()
    assert(m.length == 3)
    val bc = m.find(r => r.getString(0) == "b" && r.getString(1) == "c").get
    assert(bc.isNullAt(bc.fieldIndex("n")) && bc.isNullAt(bc.fieldIndex("chi2")))
  }

  test("correlationRatio: hand-computed eta2; extremes at 0 and 1") {
    // g1 = {1,2,3} mean 2, g2 = {4,5,6} mean 5, grand 3.5:
    // SSB = 13.5, SST = 17.5 -> eta2 = 0.771428...
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 4.0), ("g2", 5.0), ("g2", 6.0)).toDF("g", "x")
    val r = graft.profile.Association.correlationRatio(df, "g", "x")
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 13.5 / 17.5) < 1e-12)
    // perfect separation with zero within-group variance -> 1
    val sep = Seq(("a", 1.0), ("a", 1.0), ("b", 9.0)).toDF("g", "x")
    val r1 = graft.profile.Association.correlationRatio(sep, "g", "x")
      .collect().head
    assert(math.abs(r1.getDouble(2) - 1.0) < 1e-12)
    // constant numeric column -> SST = 0 -> NULL
    val const = Seq(("a", 2.0), ("b", 2.0)).toDF("g", "x")
    val r2 = graft.profile.Association.correlationRatio(const, "g", "x")
      .collect().head
    assert(r2.isNullAt(2))
  }

  test("uncertaintyCoefficient: determined = 1, independent = 0, asymmetric") {
    // b refines a (a = first char of b): knowing b pins a, not vice versa
    val df = Seq(("x", "x1"), ("x", "x2"), ("y", "y1"), ("y", "y2"))
      .toDF("a", "b")
    val r = graft.profile.Association.uncertaintyCoefficient(df, "a", "b")
      .collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12,
      s"b determines a: U(a|b) = ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12,
      s"a halves b's 2-bit entropy: U(b|a) = ${r.getDouble(5)}")
    // independent columns: MI = 0, U = 0 both ways
    val ind = (for (a <- Seq("p", "q"); b <- Seq("u", "v"))
      yield (a, b)).toDF("a", "b")
    val ri = graft.profile.Association.uncertaintyCoefficient(ind, "a", "b")
      .collect().head
    assert(math.abs(ri.getDouble(3)) < 1e-12 &&
      math.abs(ri.getDouble(4)) < 1e-12)
    // constant a: H(a) = 0 -> NULL U(a|b)
    val const = Seq(("k", "u"), ("k", "v")).toDF("a", "b")
    assert(graft.profile.Association.uncertaintyCoefficient(const, "a", "b")
      .collect().head.isNullAt(4))
  }

  test("cohenKappa: textbook 2x2 table gives kappa = 0.4; agreement = 1") {
    // 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no:
    // po = 0.7, pe = 0.5*0.6 + 0.5*0.4 = 0.5, kappa = 0.4
    val df = (Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no")))
      .toDF("a", "b")
    val r = graft.profile.Association.cohenKappa(df, "a", "b").collect().head
    assert(r.getLong(0) == 50L)
    assert(math.abs(r.getDouble(1) - 0.7) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.4) < 1e-12)
    // perfect agreement -> kappa 1 (pe < 1 as long as labels vary)
    val p = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(math.abs(graft.profile.Association.cohenKappa(p, "a", "b")
      .collect().head.getDouble(3) - 1.0) < 1e-12)
    // both labelers constant and equal: pe = 1 -> NULL kappa
    val c = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(graft.profile.Association.cohenKappa(c, "a", "b")
      .collect().head.isNullAt(3))
    // disjoint label sets: zero agreement, pe = 0 -> kappa = 0 - 0 / 1 = 0
    val d = Seq(("x", "u"), ("y", "v")).toDF("a", "b")
    val rd = graft.profile.Association.cohenKappa(d, "a", "b").collect().head
    assert(rd.getDouble(1) == 0.0 && rd.getDouble(2) == 0.0 &&
      rd.getDouble(3) == 0.0)
  }

  test("cmhTest: hand-computed pooled chi2 and MH odds ratio") {
    // two identical strata with a = 8, b = 2, c = 2, d = 8 (n = 20 each):
    // E_a = 5/stratum, V = 25/19/stratum, chi2 = (|16-10|-0.5)^2/(50/19),
    // OR_MH = (2*3.2)/(2*0.2) = 16
    def stratum(s: Int) =
      Seq.fill(8)((s, true, true)) ++ Seq.fill(2)((s, true, false)) ++
      Seq.fill(2)((s, false, true)) ++ Seq.fill(8)((s, false, false))
    val df = (stratum(1) ++ stratum(2)).toDF("s", "e", "o")
    val r = graft.profile.Association.cmhTest(df, "s", "e", "o")
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 40L && r.getLong(2) == 16L)
    assert(math.abs(r.getDouble(3) - 10.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 30.25 * 19 / 50) < 1e-12)
    assert(math.abs(r.getDouble(5) - 16.0) < 1e-12)
    // independence: O = E -> continuity correction floors chi2 at 0; OR 1
    val ind = (Seq.fill(5)((1, true, true)) ++ Seq.fill(5)((1, true, false)) ++
      Seq.fill(5)((1, false, true)) ++ Seq.fill(5)((1, false, false)))
      .toDF("s", "e", "o")
    val ri = graft.profile.Association.cmhTest(ind, "s", "e", "o")
      .collect().head
    assert(ri.getDouble(4) == 0.0 && ri.getDouble(5) == 1.0)
  }

  test("mcnemar: only discordant pairs matter; hand chi2 on a 3-vs-7 split") {
    // concordant counts are irrelevant: chi2 = (7-3)^2/10 = 1.6,
    // cc = (|4|-1)^2/10 = 0.9
    val df = (Seq.fill(20)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(7)((false, true)) ++ Seq.fill(5)((false, false)))
      .toDF("a", "b")
    val r = graft.profile.Association.mcnemar(df, "a", "b").collect().head
    assert(r.getLong(0) == 35L && r.getLong(1) == 3L && r.getLong(2) == 7L)
    assert(math.abs(r.getDouble(3) - 1.6) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.9) < 1e-12)
    // perfect agreement: no discordant pairs -> NULL chi2
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val ra = graft.profile.Association.mcnemar(agree, "a", "b").collect().head
    assert(ra.isNullAt(3) && ra.isNullAt(4))
    // |b-c| <= 1: continuity correction floors at 0
    val close = Seq((true, false), (false, true), (true, true)).toDF("a", "b")
    assert(graft.profile.Association.mcnemar(close, "a", "b")
      .collect().head.getDouble(4) == 0.0)
  }

  test("spearmanCorrelation: monotone = 1, reversed = -1, tie case hand-checked") {
    val mono = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0)).toDF("x", "y")
    val r = graft.profile.Association.spearmanCorrelation(mono, "x", "y")
      .collect().head
    assert(r.getLong(0) == 4L && math.abs(r.getDouble(1) - 1.0) < 1e-12)
    val rev = Seq((1.0, 9.0), (2.0, 4.0), (3.0, 1.0)).toDF("x", "y")
    val r2 = graft.profile.Association.spearmanCorrelation(rev, "x", "y")
      .collect().head
    assert(math.abs(r2.getDouble(1) - (-1.0)) < 1e-12)
    // x = {1,2,2,3}: avg ranks {1, 2.5, 2.5, 4} vs y ranks {1,2,3,4}
    // -> Pearson = 1.5 / sqrt(1.5 * 5/3)
    val tie = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val r3 = graft.profile.Association.spearmanCorrelation(tie, "x", "y")
      .collect().head
    assert(math.abs(r3.getDouble(1) - 1.5 / math.sqrt(1.5 * 5.0 / 3.0)) < 1e-12)
  }

  test("kendallTau: monotone = 1, reversed = -1, sparse-grid pair hand-checked") {
    val mono = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0)).toDF("x", "y")
    val r = graft.profile.Association.kendallTau(mono, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("concordant") == 6.0 && r.getAs[Double]("discordant") == 0.0)
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0) < 1e-12)
    val rev = Seq((1.0, 9.0), (2.0, 4.0), (3.0, 1.0)).toDF("x", "y")
    val r2 = graft.profile.Association.kendallTau(rev, "x", "y").collect().head
    assert(r2.getAs[Double]("discordant") == 3.0)
    assert(math.abs(r2.getAs[Double]("tau_b") - (-1.0)) < 1e-12)
    // the densification regression case: cells (1,1) and (2,2) only — the
    // concordant pair is counted through the zero-filled (2,1) grid row
    val diag = Seq((1.0, 1.0), (2.0, 2.0)).toDF("x", "y")
    val r3 = graft.profile.Association.kendallTau(diag, "x", "y").collect().head
    assert(r3.getAs[Double]("concordant") == 1.0 && r3.getAs[Double]("discordant") == 0.0)
  }

  test("somersD: asymmetric denominators by hand; binary-Y Gini identity") {
    // cells (0,0)x3, (0,1)x1, (1,1)x2: C = 6, D = 0, T_x = 7, T_y = 6
    // -> d_{Y|X} = 6/(15-7) = 0.75, d_{X|Y} = 6/(15-6) = 2/3
    val d = (Seq.fill(3)((0.0, 0.0)) ++ Seq((0.0, 1.0)) ++
      Seq.fill(2)((1.0, 1.0))).toDF("x", "y")
    val r = graft.profile.Association.somersD(d, "x", "y").collect().head
    assert(r.getAs[Double]("concordant") == 6.0)
    assert(r.getAs[Double]("discordant") == 0.0)
    assert(math.abs(r.getAs[Double]("d_y_given_x") - 0.75) < 1e-12)
    assert(math.abs(r.getAs[Double]("d_x_given_y") - 2.0 / 3) < 1e-12)
    // constant predictor: every pair is x-tied -> NULL d_{Y|X}
    val const = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    val rc = graft.profile.Association.somersD(const, "x", "y").collect().head
    assert(rc.isNullAt(rc.fieldIndex("d_y_given_x")))
    assert(math.abs(rc.getAs[Double]("d_x_given_y")) < 1e-12)
  }

  test("breslowDay: identical per-stratum ORs give BD = 0; heterogeneity fires") {
    def cells(s: Int, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    // both strata have OR = 4 -> psi_MH = 4 exactly, the expected cell
    // solves to the observed one, BD = 0, p = 1
    val homog = (cells(1, 10, 5, 5, 10) ++ cells(2, 20, 10, 10, 20))
      .toDF("s", "e", "o")
    val r = graft.profile.Association.breslowDay(homog, "s", "e", "o")
      .collect().head
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getAs[Double]("or_mh") - 4.0) < 1e-9)
    assert(r.getAs[Double]("bd_chi2") == 0.0)
    assert(r.getAs[Double]("p_value") == 1.0)
    // OR = 4 vs OR = 1/4: homogeneity must reject direction
    val heter = (cells(1, 10, 5, 5, 10) ++ cells(2, 10, 20, 20, 10))
      .toDF("s", "e", "o")
    val rh = graft.profile.Association.breslowDay(heter, "s", "e", "o")
      .collect().head
    assert(rh.getAs[Double]("bd_chi2") > 3.84)
    assert(rh.getAs[Double]("p_value") < 0.05)
    assert(rh.getLong(rh.fieldIndex("df")) == 1L)
    // degenerate: no discordant product anywhere -> psi undefined -> NULL
    val deg = (cells(1, 5, 0, 0, 5) ++ cells(2, 5, 0, 0, 5))
      .toDF("s", "e", "o")
    assert(graft.profile.Association.breslowDay(deg, "s", "e", "o")
      .collect().head.isNullAt(2))
    // single stratum -> NULL
    assert(graft.profile.Association.breslowDay(
      cells(1, 10, 5, 5, 10).toDF("s", "e", "o"), "s", "e", "o")
      .collect().head.isNullAt(3))
    // a BOUNDARY stratum (no exposed rows: r1 = 0, so no strictly
    // in-bounds root exists) carries no homogeneity information — it must
    // be excluded from BOTH the BD sum and the df count, not just zeroed
    // in the sum (which would overstate df and deflate the p-value)
    val bound = (cells(1, 10, 5, 5, 10) ++ cells(2, 20, 10, 10, 20) ++
      cells(3, 0, 0, 5, 5)).toDF("s", "e", "o")
    val rb = graft.profile.Association.breslowDay(bound, "s", "e", "o")
      .collect().head
    assert(rb.getLong(0) == 3L, "all observed strata still reported")
    assert(rb.getLong(rb.fieldIndex("df")) == 1L,
      s"df must count only contributing strata: $rb")
    assert(rb.getAs[Double]("bd_chi2") == 0.0 &&
      rb.getAs[Double]("p_value") == 1.0,
      "the two informative strata are OR-homogeneous")
  }

  test("kendallTau matches a naive pairwise reference on seeded random ties") {
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(80)((rnd.nextInt(6).toDouble, rnd.nextInt(5).toDouble))
    val got = graft.profile.Association.kendallTau(
      data.toDF("x", "y"), "x", "y").collect().head
    var (c, d, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- data.indices; j <- (i + 1) until data.length) {
      val ((x1, y1), (x2, y2)) = (data(i), data(j))
      val sx = math.signum(x2 - x1); val sy = math.signum(y2 - y1)
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
    }
    assert(got.getAs[Double]("concordant") == c.toDouble, s"C ${got.getAs[Double]("concordant")} vs $c")
    assert(got.getAs[Double]("discordant") == d.toDouble, s"D ${got.getAs[Double]("discordant")} vs $d")
    assert(got.getAs[Double]("ties_x") == tx.toDouble)
    assert(got.getAs[Double]("ties_y") == ty.toDouble)
    val n0 = data.length.toLong * (data.length - 1) / 2
    val tauRef = (c - d).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(math.abs(got.getAs[Double]("tau_b") - tauRef) < 1e-12)
    // scipy-formula variance on the same data, rebuilt from tie counts
    def tieSums(vals: Seq[Double]) = {
      val ts = vals.groupBy(identity).values.map(_.size.toDouble).filter(_ > 1)
      (ts.map(t => t * (t - 1) * (2 * t + 5)).sum,
        ts.map(t => t * (t - 1)).sum, ts.map(t => t * (t - 1) * (t - 2)).sum)
    }
    val n = data.length.toDouble
    val (vtx, t1x, t2x) = tieSums(data.map(_._1))
    val (vty, t1y, t2y) = tieSums(data.map(_._2))
    val varS = (n * (n - 1) * (2 * n + 5) - vtx - vty) / 18 +
      t1x * t1y / (2 * n * (n - 1)) + t2x * t2y / (9 * n * (n - 1) * (n - 2))
    assert(math.abs(got.getAs[Double]("z") - (c - d) / math.sqrt(varS)) < 1e-10)
  }

  test("friedmanTest: clear treatment ordering detected; incomplete blocks drop") {
    // 4 blocks, 3 treatments, treatment c always ranks 3, b 2, a 1:
    // Rj = (4, 8, 12); no ties -> classic chi2 = 12/(4*3*4)*(16+64+144) - 3*4*4 = 8
    val rows = for (blk <- 1 to 4; (t, v) <- Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
      yield (s"u$blk", t, v + blk * 10) // block offsets cancel in ranks
    val r = graft.profile.Association.friedmanTest(
      rows.toDF("b", "t", "v"), "b", "t", "v").collect().head
    assert(r.getAs[Long]("n_blocks") == 4L && r.getAs[Int]("k") == 3)
    assert(math.abs(r.getAs[Double]("chi2") - 8.0) < 1e-9,
      s"chi2 ${r.getAs[Double]("chi2")}")
    assert(r.getAs[Int]("dof") == 2)
    // an incomplete block (missing treatment) must drop whole
    val withPartial = rows ++ Seq(("u5", "a", 1.0), ("u5", "b", 2.0))
    val r2 = graft.profile.Association.friedmanTest(
      withPartial.toDF("b", "t", "v"), "b", "t", "v").collect().head
    assert(r2.getAs[Long]("n_blocks") == 4L)
    assert(math.abs(r2.getAs[Double]("chi2") - 8.0) < 1e-9)
    // all-tied blocks: A = C -> NULL chi2
    val flat = for (blk <- 1 to 3; t <- Seq("a", "b", "c"))
      yield (s"u$blk", t, 1.0)
    val r3 = graft.profile.Association.friedmanTest(
      flat.toDF("b", "t", "v"), "b", "t", "v").collect().head
    assert(r3.isNullAt(r3.fieldIndex("chi2")))
  }

  test("partialCorrelation: confounder-driven association vanishes") {
    val rnd = new scala.util.Random(3)
    // x and y depend on z only — partial correlation ~ 0, marginal strong
    val rows = Seq.fill(500) {
      val z = rnd.nextInt(50).toDouble
      (z + rnd.nextInt(7), z + rnd.nextInt(7), z)
    }
    val r = graft.profile.Association.partialCorrelation(
      rows.toDF("x", "y", "z"), "x", "y", "z").collect().head
    assert(r.getAs[Double]("r_xy") > 0.8, "marginal must be strong")
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) < 0.15,
      s"partial ${r.getAs[Double]("r_xy_given_z")} should be near 0")
    // formula cross-check from the marginals it reports
    val (rxy, rxz, ryz) = (r.getAs[Double]("r_xy"), r.getAs[Double]("r_xz"),
      r.getAs[Double]("r_yz"))
    val ref = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("r_xy_given_z") - ref) < 1e-12)
    // degenerate: y == z -> |r_yz| = 1 -> NULL
    val degen = rows.map { case (x, _, z) => (x, z, z) }
    val r2 = graft.profile.Association.partialCorrelation(
      degen.toDF("x", "y", "z"), "x", "y", "z").collect().head
    assert(r2.isNullAt(r2.fieldIndex("r_xy_given_z")))
  }

  test("cochranArmitage: monotone trend detected, formula hand-checked") {
    def grp(w: Double, k: Int, n: Int) =
      (Seq.fill(k)((w, true)) ++ Seq.fill(n - k)((w, false)))
    val rising = (grp(0.0, 1, 10) ++ grp(1.0, 5, 10) ++ grp(2.0, 9, 10))
      .toDF("w", "s")
    val r = graft.profile.Association.cochranArmitage(rising, "w", "s")
      .collect().head
    // hand formula: T = sum k_i w_i - pbar sum n_i w_i
    val pbar = 15.0 / 30
    val tRef = (1 * 0.0 + 5 * 1.0 + 9 * 2.0) - pbar * (10 * 0.0 + 10 * 1.0 + 10 * 2.0)
    val varRef = pbar * (1 - pbar) *
      ((10 * 0.0 + 10 * 1.0 + 10 * 4.0) - math.pow(10 * 0.0 + 10 * 1.0 + 10 * 2.0, 2) / 30)
    assert(math.abs(r.getAs[Double]("slope_num") - tRef) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - tRef / math.sqrt(varRef)) < 1e-12)
    assert(r.getAs[Double]("z") > 3, "a 10%->50%->90% ramp is a strong trend")
    // flat rates: |z| small; constant outcome: NULL
    val flat = (grp(0.0, 5, 10) ++ grp(1.0, 5, 10) ++ grp(2.0, 5, 10))
      .toDF("w", "s")
    val rf = graft.profile.Association.cochranArmitage(flat, "w", "s")
      .collect().head
    assert(math.abs(rf.getAs[Double]("z")) < 1e-9)
    val const = (grp(0.0, 10, 10) ++ grp(1.0, 10, 10)).toDF("w", "s")
    val rc = graft.profile.Association.cochranArmitage(const, "w", "s")
      .collect().head
    assert(rc.isNullAt(rc.fieldIndex("z")))
  }

  test("fisherExact matches the textbook hypergeometric tails") {
    // the scipy-docs table [[1,9],[11,3]]: two-sided 0.00275946,
    // greater 0.99996635, less 0.00137973
    def table(a11: Int, a10: Int, a01: Int, a00: Int) =
      (Seq.fill(a11)((true, true)) ++ Seq.fill(a10)((true, false)) ++
        Seq.fill(a01)((false, true)) ++ Seq.fill(a00)((false, false)))
        .toDF("a", "b")
    val r = graft.profile.Association.fisherExact(table(1, 9, 11, 3), "a", "b")
      .collect().head
    assert(r.getAs[Long]("a11") == 1L && r.getAs[Long]("a00") == 3L)
    assert(math.abs(r.getAs[Double]("p_two_sided") - 0.002759456185220094) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_greater") - 0.9999663480953025) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_less") - 0.001379728092610047) < 1e-9)
    assert(math.abs(r.getAs[Double]("odds_ratio") - 1.0 * 3 / (9.0 * 11)) < 1e-12)
    val r2 = graft.profile.Association.fisherExact(table(7, 3, 2, 8), "a", "b")
      .collect().head
    assert(math.abs(r2.getAs[Double]("p_two_sided") - 0.06977851869492707) < 1e-9)
    assert(math.abs(r2.getAs[Double]("p_greater") - 0.034889259347463536) < 1e-9)
    // degenerate margins: a constant condition -> the only table is the
    // observed one, every tail is 1
    val const = graft.profile.Association.fisherExact(table(0, 0, 5, 7), "a", "b")
      .collect().head
    assert(const.getAs[Double]("p_two_sided") == 1.0 &&
      const.getAs[Double]("p_greater") == 1.0 &&
      const.isNullAt(const.fieldIndex("odds_ratio")))
  }

  test("gTest: independence ~ 0, perfect association hand value") {
    // independent 2x2: every cell 25 -> G = 0
    val ind = (0 until 100).map(i => ((i % 2).toString, (i / 2 % 2).toString))
      .toDF("a", "b")
    val ri = graft.profile.Association.gTest(ind, "a", "b").collect().head
    assert(ri.getLong(0) == 100L && ri.getLong(4) == 1L)
    assert(math.abs(ri.getAs[Double]("g")) < 1e-12)
    // perfect association: diagonal cells only -> G = 2*n*ln(2) for 2x2
    val per = ((1 to 10).map(_ => ("x", "u")) ++ (1 to 10).map(_ => ("y", "v")))
      .toDF("a", "b")
    val rp = graft.profile.Association.gTest(per, "a", "b").collect().head
    assert(math.abs(rp.getAs[Double]("g") - 2 * 20 * math.log(2)) < 1e-9)
    assert(rp.getAs[Double]("p_value") < 1e-6)
    // constant column: df 0 -> NULL
    val c = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    assert(graft.profile.Association.gTest(c, "a", "b")
      .collect().head.isNullAt(3))
  }

  test("cronbachAlpha: parallel items = 1, orthogonal = 0, reversed < 0") {
    // three identical items: alpha exactly 1
    val par = (0 until 40).map { i =>
      val x = (i % 7).toDouble; (x, x, x)
    }.toDF("a", "b", "c")
    val rp = graft.profile.Association.cronbachAlpha(par, Seq("a", "b", "c"))
      .collect().head
    assert(rp.getLong(0) == 40L && rp.getLong(1) == 3L)
    assert(math.abs(rp.getAs[Double]("alpha") - 1.0) < 1e-12)
    // pairwise-orthogonal sign patterns: total var = sum of item vars
    val pats = Seq((1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1))
    val ort = (0 until 80).map { i =>
      val (a, b, c) = pats(i % 4); (a.toDouble, b.toDouble, c.toDouble)
    }.toDF("a", "b", "c")
    val ro = graft.profile.Association.cronbachAlpha(ort, Seq("a", "b", "c"))
      .collect().head
    assert(math.abs(ro.getAs[Double]("alpha")) < 1e-12)
    // a reversed item drives alpha negative
    val rev = (0 until 40).map { i =>
      val x = (i % 7).toDouble; (x, x, -x)
    }.toDF("a", "b", "c")
    val rr = graft.profile.Association.cronbachAlpha(rev, Seq("a", "b", "c"))
      .collect().head
    assert(rr.getAs[Double]("alpha") < -0.5)
    // constant total: NULL
    val const = (0 until 10).map(_ => (1.0, 1.0, 1.0)).toDF("a", "b", "c")
    assert(graft.profile.Association.cronbachAlpha(const, Seq("a", "b", "c"))
      .collect().head.isNullAt(4))
  }

  test("numericMutualInfo: identity ~ max, independent ~ 0, U-shape caught") {
    // y = x: every bin maps 1:1 -> MI = H = ln(bins), NMI = 1
    val ident = (0 until 400).map(i => (i.toDouble, i.toDouble)).toDF("a", "b")
    val ri = graft.profile.Association.numericMutualInfo(ident, "a", "b",
      bins = 10).collect().head
    assert(ri.getLong(0) == 400L && ri.getLong(1) == 10L)
    assert(math.abs(ri.getAs[Double]("mi_nats") - math.log(10)) < 1e-9)
    assert(math.abs(ri.getAs[Double]("nmi") - 1.0) < 1e-9)
    // independent grid: MI exactly 0
    val ind = (0 until 400).map(i => ((i % 20).toDouble, (i / 20).toDouble))
      .toDF("a", "b")
    val rn = graft.profile.Association.numericMutualInfo(ind, "a", "b",
      bins = 4).collect().head
    assert(math.abs(rn.getAs[Double]("mi_nats")) < 1e-12)
    // U-shape: zero linear correlation, strong MI
    val u = (-200 until 200).map(i => (i.toDouble, (i.toDouble * i)))
      .toDF("a", "b")
    val ru = graft.profile.Association.numericMutualInfo(u, "a", "b", bins = 8)
      .collect().head
    assert(ru.getAs[Double]("mi_nats") > 0.5,
      s"U-shape must carry MI: ${ru.getAs[Double]("mi_nats")}")
    // constant column: single bin -> MI 0, NMI NULL
    val c = (0 until 50).map(i => (i.toDouble, 7.0)).toDF("a", "b")
    val rc = graft.profile.Association.numericMutualInfo(c, "a", "b")
      .collect().head
    assert(rc.getLong(2) == 1L)
    assert(math.abs(rc.getAs[Double]("mi_nats")) < 1e-12)
    assert(rc.isNullAt(rc.fieldIndex("nmi")))
  }

  test("weightedKappa: perfect = 1, hand quadratic case, near-miss ordering") {
    // perfect agreement: kappa_w = 1 regardless of weights
    val perfect = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (1.0, 1.0))
      .toDF("a", "b")
    val rp = graft.profile.Association.weightedKappa(perfect, "a", "b")
      .collect().head
    assert(math.abs(rp.getAs[Double]("kappa_w") - 1.0) < 1e-12)
    // hand case on a 3-level scale (k = 3): ratings (1,2) and (1,3)
    // disagree by 1 and 2 steps; quadratic penalties 1/4 and 1
    val h = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0), (2.0, 2.0))
      .toDF("a", "b")
    val rh = graft.profile.Association.weightedKappa(h, "a", "b")
      .collect().head
    assert(rh.getLong(0) == 4L && rh.getLong(1) == 3L)
    // observed penalty = (0 + 1/4 + 1 + 0)/4
    assert(math.abs(rh.getAs[Double]("obs_penalty") - 1.25 / 4) < 1e-12)
    // near-miss raters must score HIGHER than far-miss raters with the
    // same plain-kappa disagreement count
    val near = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (1.0, 2.0))
      .toDF("a", "b")
    val far = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (1.0, 3.0))
      .toDF("a", "b")
    val kn = graft.profile.Association.weightedKappa(near, "a", "b")
      .collect().head.getAs[Double]("kappa_w")
    val kf = graft.profile.Association.weightedKappa(far, "a", "b")
      .collect().head.getAs[Double]("kappa_w")
    assert(kn > kf, s"near-miss $kn must beat far-miss $kf")
    // linear vs quadratic: quadratic punishes the far miss harder
    val kl = graft.profile.Association.weightedKappa(far, "a", "b", "linear")
      .collect().head.getAs[Double]("kappa_w")
    assert(kl != kf)
    // single shared level: expected penalty 0 -> NULL
    val c = Seq((1.0, 1.0), (1.0, 1.0)).toDF("a", "b")
    assert(graft.profile.Association.weightedKappa(c, "a", "b")
      .collect().head.isNullAt(4))
  }

  test("cochranQ: hand-computed Q, incomplete-block drop, degenerate NULL") {
    // 4 items x 3 treatments: T = (4,2,1), R = (2,1,3,1)
    // Q = (k-1)(k*SumT^2 - (SumT)^2)/(k*SumR - SumR^2) = 2*(63-49)/6 = 14/3
    val obs = Seq(
      (1L, "A", 1), (1L, "B", 1), (1L, "C", 0),
      (2L, "A", 1), (2L, "B", 0), (2L, "C", 0),
      (3L, "A", 1), (3L, "B", 1), (3L, "C", 1),
      (4L, "A", 1), (4L, "B", 0), (4L, "C", 0)).toDF("i", "tr", "x")
    val r = graft.profile.Association.cochranQ(obs, "i", "tr", "x")
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(3) == 2L)
    assert(math.abs(r.getAs[Double]("q") - 14.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-7.0 / 3.0)) < 1e-12)
    // an item missing treatment C drops; duplicates reduce by max
    val more = obs.union(Seq((5L, "A", 1), (5L, "B", 1),
      (2L, "C", 1), (2L, "C", 0)).toDF("i", "tr", "x"))
    val rm = graft.profile.Association.cochranQ(more, "i", "tr", "x")
      .collect().head
    assert(rm.getLong(0) == 4L, "incomplete item 5 must drop")
    // max-reduction flipped item 2's C cell to 1: T = (4,2,2), R = (2,2,3,1)
    // Q = 2*(3*24 - 64)/(3*8 - 18) = 16/6
    assert(math.abs(rm.getAs[Double]("q") - 16.0 / 6.0) < 1e-12)
    // all-success blocks: denominator 0 -> NULL
    val flat = Seq((1L, "A", 1), (1L, "B", 1), (2L, "A", 1), (2L, "B", 1))
      .toDF("i", "tr", "x")
    assert(graft.profile.Association.cochranQ(flat, "i", "tr", "x")
      .collect().head.isNullAt(2))
  }

  test("fleissKappa: Fleiss 1971 table, single-rating drop, constant NULL") {
    // the classic 10-subject / 14-rater / 5-category table (Fleiss 1971):
    // kappa = 0.210 (P-bar 0.378, Pe 0.213)
    val counts = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val ratings = counts.zipWithIndex.flatMap { case (row, item) =>
      row.zipWithIndex.flatMap { case (c, cat) =>
        Seq.fill(c)((item.toLong, s"c$cat"))
      }
    }
    val r = graft.profile.Association
      .fleissKappa(ratings.toDF("item", "cat"), "item", "cat")
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 140L && r.getLong(2) == 5L)
    assert(math.abs(r.getAs[Double]("p_bar") - 0.3780219780219781) < 1e-12)
    assert(math.abs(r.getAs[Double]("p_e") - 0.2127551020408163) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 0.20993) < 5e-4)
    // items with a single rating drop from BOTH P-bar and the marginals
    val mixed = ratings ++ Seq((99L, "c0"))
    val rm = graft.profile.Association
      .fleissKappa(mixed.toDF("item", "cat"), "item", "cat").collect().head
    assert(rm.getLong(0) == 10L && rm.getLong(1) == 140L)
    assert(math.abs(rm.getAs[Double]("p_bar") - r.getAs[Double]("p_bar")) < 1e-12)
    // a single category everywhere: pe = 1 -> NULL kappa
    val c = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("item", "cat")
    val rc = graft.profile.Association.fleissKappa(c, "item", "cat")
      .collect().head
    assert(rc.isNullAt(rc.fieldIndex("kappa")))
    assert(math.abs(rc.getAs[Double]("p_bar") - 1.0) < 1e-12)
  }
}

package graft

import graft.operators.Sampling
import graft.profile.{Drift, StatTests}
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("psi is ~0 for identical distributions") {
    val a = (1 to 1000).map(i => i.toDouble % 100).toDF("x")
    val b = (1 to 1000).map(i => i.toDouble % 100).toDF("x")
    val psi = Drift.psi(a, b, Seq("x")).collect().head.getDouble(1)
    assert(math.abs(psi) < 1e-12, s"identical dists must give psi 0, got $psi")
  }

  test("psi detects a shifted distribution and decomposes over bins") {
    val a = (1 to 1000).map(_.toDouble % 100).toDF("x")         // uniform 0..99
    val b = (1 to 1000).map(i => 50.0 + i % 50).toDF("x")       // uniform 50..99
    val bins = Drift.psiBins(a, b, Seq("x"), bins = 10).collect()
    val byBin = bins.map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    // combined range [0, 99]: b occupies only the top five bins
    assert(byBin(0)._2 == 0L && byBin(4)._2 == 0L)
    assert(byBin(9)._1 == 100L && byBin(9)._2 == 200L)
    val psi = Drift.psi(a, b, Seq("x")).collect().head.getDouble(1)
    assert(psi > 0.25, s"major shift must exceed 0.25, got $psi")
  }

  test("psi handles multiple columns and empty-side bins via eps") {
    val a = Seq((0.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val b = Seq((100.0, 1.0), (101.0, 2.0), (102.0, 3.0)).toDF("x", "y")
    val out = Drift.psi(a, b, Seq("x", "y"), bins = 4).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("x") > 1.0, "disjoint ranges must give a large finite psi")
    assert(math.abs(out("y")) < 1e-12, "identical y must give psi 0")
    assert(!out.values.exists(_.isInfinite), "eps floor must keep terms finite")
  }

  test("weightedSample matches a JVM recompute of the E-S construction") {
    val df = (1L to 300L).map(i => (i, (i % 37 + 1).toDouble)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 40, salt = "s:")
      .select("id").as[Long].collect().toSet
    // independent recompute: same md5-uint32 → u → ln(u)/w ranking
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(s"s:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
      math.log(u) / w
    }
    val want = (1L to 300L).map(i => i -> key(i, (i % 37 + 1).toDouble))
      .sortBy(-_._2).take(40).map(_._1).toSet
    assert(got == want)
  }

  test("weightedSamplePerGroup caps each group at k and matches a recompute") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "even" else "odd",
      (i % 11 + 1).toDouble)).toDF("id", "g", "w")
    val got = Sampling.weightedSamplePerGroup(df, Seq("g"), "id", "w", k = 7,
      salt = "pg:")
    val counts = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("even" -> 7L, "odd" -> 7L))
    // matches the window-path recompute (heap vs window parity)
    val viaWindow = Sampling.weightedSamplePerGroup(
      df, Seq("g"), "id", "w", k = 7, salt = "pg:")
    val a = got.select("id").as[Long].collect().toSet
    val b = viaWindow.select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("weightedSample is deterministic and biased toward heavy weights") {
    val df = (1L to 1000L).map(i => (i, if (i <= 100) 1000.0 else 1.0)).toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", k = 50, salt = "d:")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(df, "id", "w", k = 50, salt = "d:")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "same salt must reproduce the same sample")
    // 100 heavy rows hold ~99% of total weight: expect heavy dominance
    assert(s1.count(_ <= 100L) > 40, s"heavy rows underrepresented: $s1")
    // zero/negative weights are excluded
    val withBad = df.withColumn("w", when(col("id") === 1L, -5.0).otherwise(col("w")))
    val s3 = Sampling.weightedSample(withBad, "id", "w", k = 50, salt = "d:")
      .select("id").as[Long].collect().toSet
    assert(!s3.contains(1L))
  }

  test("ksStatistic: identical samples give 0, disjoint give 1") {
    val a = (1 to 50).map(_.toDouble % 10).toDF("x")
    val b = (1 to 50).map(_.toDouble % 10).toDF("x")
    val same = Drift.ksStatistic(a, b, "x").collect().head
    assert(same.getDouble(2) == 0.0)
    val lo = Seq(1.0, 2.0, 3.0).toDF("x")
    val hi = Seq(100.0, 200.0).toDF("x")
    val far = Drift.ksStatistic(lo, hi, "x").collect().head
    assert(far.getLong(0) == 3L && far.getLong(1) == 2L)
    assert(far.getDouble(2) == 1.0) // CDFs fully separated
  }


  test("ksByGroup localizes drift to the moved group; one-sided groups drop") {
    val a = ((1 to 50).map(i => ("stable", i.toDouble % 10)) ++
      (1 to 50).map(i => ("moved", i.toDouble % 10)) ++
      (1 to 5).map(i => ("only_a", i.toDouble))).toDF("g", "x")
    val b = ((1 to 50).map(i => ("stable", i.toDouble % 10)) ++
      (1 to 50).map(i => ("moved", 100.0 + i % 10))).toDF("g", "x")
    val out = Drift.ksByGroup(a, b, "g", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("stable") == 0.0)
    assert(out("moved") == 1.0)
    assert(!out.contains("only_a"), "one-sided group must be excluded")
  }

  test("quantileNormalize: exact inverse-CDF mapping onto the reference") {
    val ref = Seq(10.0, 20.0, 30.0, 40.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val tgt = Seq((100L, 1.0), (101L, 2.0), (102L, 3.0), (103L, 4.0)).toDF("id", "v")
    val out = graft.profile.Drift.quantileNormalize(ref, tgt, "id", "v")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // target ranks 0.25, 0.5, 0.75, 1.0 map to ref quartile values exactly
    assert(out(100L) == ((0.25, 10.0)))
    assert(out(101L) == ((0.5, 20.0)))
    assert(out(102L) == ((0.75, 30.0)))
    assert(out(103L) == ((1.0, 40.0)))
    // idempotence: normalizing the reference onto itself is the identity
    val self = graft.profile.Drift.quantileNormalize(ref, ref, "id", "v")
      .collect().map(r => r.getDouble(1) -> r.getDouble(3))
    assert(self.forall { case (v, nv) => v == nv })
  }

  test("trendSlope recovers an exact linear trend per key") {
    val df = (0 until 10).flatMap { x =>
      Seq(("up", x.toDouble, 2.0 * x + 1.0), ("flat", x.toDouble, 5.0))
    }.toDF("k", "x", "y")
    val out = graft.profile.Drift.trendSlope(df, Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (n, slope, icept) = out("up")
    assert(n == 10L && math.abs(slope - 2.0) < 1e-9 && math.abs(icept - 1.0) < 1e-9)
    assert(math.abs(out("flat")._2) < 1e-9) // zero slope
  }

  test("trendSlope: a single-x group has undefined slope (NULL)") {
    val df = Seq(("k1", 1.0, 3.0), ("k1", 1.0, 7.0)).toDF("k", "x", "y")
    val row = graft.profile.Drift.trendSlope(df, Seq("k"), "x", "y").collect().head
    assert(row.isNullAt(2)) // var(x) = 0 -> NULL, native regr_slope semantics
  }

  test("mannWhitneyU: hand-computed ranks, ties and z on a 3v3 sample") {
    // a = {1,2,3}, b = {2,3,4}: avg ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    // R_a = 1 + 2.5 + 4.5 = 8, U_a = 8 - 6 = 2, U_b = 7
    // ties: two groups of 2 -> sum(t^3 - t) = 12
    // sigma^2 = (9/12)*(7 - 12/30) = 4.95, z = (2 - 4.5)/sqrt(4.95)
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val r = StatTests.mannWhitneyU(a, b, "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 7.0 && r.getDouble(4) == 2.0)
    assert(math.abs(r.getDouble(5) - (-2.5 / math.sqrt(4.95))) < 1e-12)
  }

  test("mannWhitneyU: empty side and all-tied sample yield NULL z") {
    val a = Seq(1.0, 1.0).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    val r1 = StatTests.mannWhitneyU(a, empty, "v").collect().head
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 0L && r1.isNullAt(5))
    // all values identical: one tie group of 4 -> sigma^2 = 0
    val r2 = StatTests.mannWhitneyU(a, Seq(1.0, 1.0).toDF("v"), "v").collect().head
    assert(r2.getDouble(2) == 2.0 && r2.isNullAt(5))
  }

  test("ksPValue: Kolmogorov tail at known points; small-lambda guard") {
    val df = Seq(1.0, 0.5, 0.01).toDF("l")
      .select(Drift.ksPValue(col("l")).as("p"), col("l"))
      .collect().map(r => r.getDouble(1) -> r.getDouble(0)).toMap
    assert(math.abs(df(1.0) - 0.26999967) < 1e-6)   // scipy kstwobign.sf(1.0)
    assert(math.abs(df(0.5) - 0.9639452) < 1e-5)    // scipy kstwobign.sf(0.5)
    assert(df(0.01) == 1.0, "guard: truncated series invalid below 0.037")
  }

  test("ksByGroupFdr: drifted group rejected, identical group keeps p = 1") {
    val a = ((1 to 20).map(i => ("g1", i.toDouble)) ++
      (1 to 20).map(i => ("g2", i.toDouble))).toDF("g", "v")
    val b = ((1 to 20).map(i => ("g1", i.toDouble + 100)) ++ // disjoint: D = 1
      (1 to 20).map(i => ("g2", i.toDouble))).toDF("g", "v")
    val rows = Drift.ksByGroupFdr(a, b, "g", "v", alpha = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(rows("g1")._1 == 1.0 && rows("g1")._2 < 1e-6 && rows("g1")._3,
      s"disjoint group must reject: ${rows("g1")}")
    assert(rows("g2")._1 == 0.0 && rows("g2")._2 == 1.0 && !rows("g2")._3,
      s"identical group must not reject: ${rows("g2")}")
  }

  test("ksByGroupFdr: the returned frame reads the persisted battery once") {
    val a = (1 to 20).map(i => ("g1", i.toDouble)).toDF("g", "v")
    val b = (1 to 20).map(i => ("g1", i.toDouble)).toDF("g", "v")
    val out = Drift.ksByGroupFdr(a, b, "g", "v")
    // structural collect on the pre-AQE plan: InMemoryTableScanExec has no
    // children, so any Join NODE here would be a battery re-evaluation
    // OUTSIDE the cache (the cached relation's internal plan is not
    // traversed)
    val p = out.queryExecution.sparkPlan
    assert(p.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s }.nonEmpty,
      s"returned frame must read the persisted battery:\n$p")
    assert(p.collect {
      case j if j.nodeName.contains("Join") => j }.isEmpty,
      s"no battery re-evaluation in the returned plan:\n$p")
    graft.ops.ScaleOps.releaseCheckpointBlocks(out)
  }

  test("permutation coin conditions on a 9:1 design (empirical level holds)") {
    // two samples DRAWN FROM THE SAME distribution, sizes 90 and 10: a
    // fair 1/2 coin would relabel to ~50:50 splits whose null stats are
    // too tight, inflating rejections. With the n_a/(n_a+n_b)-weighted
    // coin the add-one p-value is near-uniform: at a true null, p below
    // 0.10 should be rare across these deterministic relabelings.
    val vals = (1 to 100).map(i => (i * 37 % 101).toDouble) // fixed scramble
    val a = (1 to 90).map(i => (i.toLong, vals(i - 1))).toDF("id", "v")
    val bb = (91 to 100).map(i => (i.toLong, vals(i - 1))).toDF("id", "v")
    val r = StatTests.permutationTestMeanDiff(a, bb, "id", "v", nPerms = 200)
      .collect().head
    assert(r.getLong(0) == 90L && r.getLong(1) == 10L)
    assert(r.getDouble(5) > 0.10,
      s"null 9:1 design must not reject, p = ${r.getDouble(5)}")
    // and a genuinely shifted 9:1 design still rejects
    val hi = (91 to 100).map(i => (i.toLong, vals(i - 1) + 500.0)).toDF("id", "v")
    val s = StatTests.permutationTestMeanDiff(a, hi, "id", "v", nPerms = 200)
      .collect().head
    assert(s.getDouble(5) < 0.05,
      s"shifted 9:1 design must reject, p = ${s.getDouble(5)}")
  }

  test("welchTTest: hand-computed t/df/d; degenerate sides go NULL") {
    val a = Seq(1, 2, 3, 4, 5).map(_.toDouble).toDF("v")
    val b = Seq(2, 4, 6, 8).map(_.toDouble).toDF("v")
    val r = StatTests.welchTTest(a, b, "v").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 5.0)
    assert(math.abs(r.getDouble(4) - (-1.3587324409735149)) < 1e-12)
    assert(math.abs(r.getDouble(5) - 4.749414519906324) < 1e-12)
    assert(math.abs(r.getDouble(6) - (-0.9660917830792959)) < 1e-12)
    // n < 2 on one side -> NULL t/df/d, means still reported
    val one = Seq(7.0).toDF("v")
    val e = StatTests.welchTTest(a, one, "v").collect().head
    assert(e.getDouble(3) == 7.0 && e.isNullAt(4) && e.isNullAt(5))
    // zero variance both sides -> NULL t (se = 0)
    val c1 = Seq(2.0, 2.0).toDF("v"); val c2 = Seq(3.0, 3.0).toDF("v")
    assert(StatTests.welchTTest(c1, c2, "v").collect().head.isNullAt(4))
  }

  test("anovaF: hand-computed F on three groups; one group -> NULL") {
    val df = (Seq(1, 2, 3).map(("g1", _)) ++ Seq(2, 3, 4).map(("g2", _)) ++
      Seq(10, 11, 12).map(("g3", _))).toDF("g", "v")
    val r = StatTests.anovaF(df, "g", "v").collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 146.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 73.0) < 1e-9)
    val single = Seq(("g1", 1), ("g1", 2)).toDF("g", "v")
    assert(StatTests.anovaF(single, "g", "v").collect().head.isNullAt(4))
  }

  test("welch/anova/kruskal match naive references on seeded random groups") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val k = 2 + rnd.nextInt(3)
      val groups = (0 until k).map { g =>
        g -> Seq.fill(5 + rnd.nextInt(25))((rnd.nextInt(12) + 1).toDouble)
      }
      val df = groups.flatMap { case (g, vs) => vs.map((s"g$g", _)) }
        .toDF("g", "v")
      // ANOVA reference from definitional sums of squares
      val all = groups.flatMap(_._2)
      val grand = all.sum / all.size
      val ssb = groups.map { case (_, vs) =>
        val m = vs.sum / vs.size; vs.size * (m - grand) * (m - grand) }.sum
      val ssw = groups.map { case (_, vs) =>
        val m = vs.sum / vs.size; vs.map(x => (x - m) * (x - m)).sum }.sum
      val fRef = (ssb / (k - 1)) / (ssw / (all.size - k))
      val fr = StatTests.anovaF(df, "g", "v").collect().head
      assert(math.abs(fr.getDouble(2) - ssb) < 1e-6 * (1 + ssb), s"trial $trial ssb")
      assert(math.abs(fr.getDouble(3) - ssw) < 1e-6 * (1 + ssw), s"trial $trial ssw")
      assert(math.abs(fr.getDouble(4) - fRef) < 1e-6 * (1 + fRef), s"trial $trial F")
      // Kruskal-Wallis reference with average ranks + tie correction
      val sorted = all.sorted
      val rank = all.distinct.map { v =>
        val below = sorted.count(_ < v); val cnt = sorted.count(_ == v)
        v -> (below + (cnt + 1) / 2.0)
      }.toMap
      val nAll = all.size.toDouble
      val sr = groups.map { case (_, vs) =>
        val rg = vs.map(rank).sum; rg * rg / vs.size }.sum
      val ties = all.groupBy(identity).values
        .map(g => { val t = g.size.toDouble; t * t * t - t }).sum
      val c = 1.0 - ties / (nAll * nAll * nAll - nAll)
      val hRef = (12.0 / (nAll * (nAll + 1)) * sr - 3.0 * (nAll + 1)) / c
      val kr = StatTests.kruskalWallis(df, "g", "v").collect().head
      assert(math.abs(kr.getDouble(2) - hRef) < 1e-6 * (1 + math.abs(hRef)),
        s"trial $trial H ${kr.getDouble(2)} vs $hRef")
      // Welch reference on the first two groups
      val (va0, vb0) = (groups(0)._2, groups(1)._2)
      def m(v: Seq[Double]) = v.sum / v.size
      def s2(v: Seq[Double]) = {
        val mm = m(v); v.map(x => (x - mm) * (x - mm)).sum / (v.size - 1) }
      val (wa, wb) = (s2(va0) / va0.size, s2(vb0) / vb0.size)
      val tRef = (m(va0) - m(vb0)) / math.sqrt(wa + wb)
      val wr = StatTests.welchTTest(
        va0.toDF("v"), vb0.toDF("v"), "v").collect().head
      assert(math.abs(wr.getDouble(4) - tRef) < 1e-6 * (1 + math.abs(tRef)),
        s"trial $trial t ${wr.getDouble(4)} vs $tRef")
    }
  }

  test("brownForsythe: unequal spreads reject; equal spreads give F ~ 0") {
    // g1 tightly packed around 10, g2 spread wide around 10: same means,
    // very different |x - median| deviations
    val df = (Seq(9, 10, 10, 11).map(("g1", _)) ++
      Seq(1, 5, 15, 19).map(("g2", _))).toDF("g", "v")
    val r = StatTests.brownForsythe(df, "g", "v").collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L)
    // z1 = (1,0,0,1), z2 = (9,5,5,9): hand F = anovaF on those
    // ssb = (2^2/4 + 28^2/4) - 30^2/8 = 84.5; ssw = (2 - 1) + (212 - 196) = 17
    assert(math.abs(r.getDouble(2) - 84.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 17.0) < 1e-9)
    assert(math.abs(r.getDouble(4) - 84.5 / (17.0 / 6)) < 1e-9)
    // identical groups: deviations identical -> SSB exactly 0
    val same = (Seq(1, 2, 3).map(("a", _)) ++ Seq(1, 2, 3).map(("b", _)))
      .toDF("g", "v")
    assert(math.abs(StatTests.brownForsythe(same, "g", "v")
      .collect().head.getDouble(2)) < 1e-9)
  }

  test("kruskalWallis: tie-free H = 3.857...; all-tied -> NULL") {
    // ranks 1..6, R1 = 6, R2 = 15: H = 12/42*(12+75) - 21 = 27/7
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    val r = StatTests.kruskalWallis(df, "g", "v").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 27.0 / 7.0) < 1e-12, s"h=${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0) // no ties
    // every value equal: tie correction 0 -> NULL H
    val tied = Seq(("a", 5), ("a", 5), ("b", 5), ("b", 5)).toDF("g", "v")
    val tr = StatTests.kruskalWallis(tied, "g", "v").collect().head
    assert(tr.isNullAt(2) && tr.getDouble(3) == 0.0)
  }

  test("distributionDistances: hand-computed TV/Hellinger/chi2 on 2 cats") {
    val a = (Seq.fill(3)("x") ++ Seq.fill(1)("y")).toDF("c")
    val b = (Seq.fill(1)("x") ++ Seq.fill(3)("y")).toDF("c")
    val r = Drift.distributionDistances(a, b, "c").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(4) -
      (math.sqrt(0.75) - math.sqrt(0.25))) < 1e-12)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)
    // identical distributions -> all zeros
    val z = Drift.distributionDistances(a, a, "c").collect().head
    assert(z.getDouble(3) == 0.0 && z.getDouble(4) == 0.0 &&
      z.getDouble(5) == 0.0)
  }

  test("cusumChangepoint: level shift located exactly; rates per regime") {
    // 5 days at 2 events/day then 5 days at 10/day
    val rows = (1 to 5).flatMap(d => Seq.fill(2)(s"2024-01-0$d 12:00:00")) ++
      (6 to 10).flatMap(d => Seq.fill(10)(f"2024-01-$d%02d 12:00:00"))
    val df = rows.toDF("s").select(col("s").cast("timestamp").as("ts"))
    val r = StatTests.cusumChangepoint(df, "ts").collect().head
    assert(r.getLong(0) == 10L)
    assert(r.getDate(1).toString == "2024-01-05", s"day=${r.getDate(1)}")
    // D_5 = 10*10 - 5*60 = -200 -> |D|/T = 20
    assert(math.abs(r.getDouble(2) - 20.0) < 1e-12)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 10.0)
  }

  test("qqDrift: constant shift appears at every decile; empty side nulls") {
    val a = (1 to 10).map(_.toDouble).toDF("v")
    val b = (1 to 10).map(_ + 5.0).toDF("v")
    val rows = Drift.qqDrift(a, b, "v").orderBy("p").collect()
    assert(rows.length == 9)
    assert(rows.forall(r => math.abs(r.getDouble(3) - 5.0) < 1e-9),
      s"got ${rows.map(_.getDouble(3)).toSeq}")
    // median of 1..10 under linear interpolation = 5.5
    assert(math.abs(rows(4).getDouble(1) - 5.5) < 1e-12)
    val empty = Seq.empty[Double].toDF("v")
    val e = Drift.qqDrift(a, empty, "v").collect()
    assert(e.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("theilSenTrend: median slope shrugs off a 50x outlier day") {
    // daily counts 2,4,6,100,10 on consecutive days: OLS would chase the
    // 100; the median pairwise slope is exactly 2
    val counts = Seq(2, 4, 6, 100, 10)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(f"2024-01-${i + 1}%02d 12:00:00")
    }
    val df = rows.toDF("s").select(col("s").cast("timestamp").as("ts"))
    val r = StatTests.theilSenTrend(df, "ts").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 2.0, s"slope=${r.getDouble(2)}")
    // intercept = median(y - 2x) over epoch-day x (2024-01-01 = 19723)
    assert(r.getDouble(3) == 2.0 - 2.0 * 19723, s"intercept=${r.getDouble(3)}")
    // single day -> NULL slope
    val one = Seq.fill(3)("2024-01-01 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    assert(StatTests.theilSenTrend(one, "ts").collect().head.isNullAt(2))
  }

  test("mannKendall: monotone series rejects; flat series degenerates") {
    // counts 1..6 over six days: S = 15, varS = 6*5*17/18, z = 14/sqrt(varS)
    val inc = (1 to 6).flatMap(d =>
      Seq.fill(d)(f"2024-01-0$d 12:00:00")).toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val r = StatTests.mannKendall(inc, "ts").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 15L)
    val varS = 6.0 * 5 * 17 / 18
    assert(math.abs(r.getDouble(2) - varS) < 1e-9)
    assert(math.abs(r.getDouble(3) - 14.0 / math.sqrt(varS)) < 1e-12)
    assert(r.getString(4) == "increasing")
    // constant rate: all counts tie -> varS = 0 -> NULL z, no trend
    val flat = (1 to 6).flatMap(d =>
      Seq.fill(3)(f"2024-01-0$d 12:00:00")).toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val rf = StatTests.mannKendall(flat, "ts").collect().head
    assert(rf.getLong(1) == 0L && rf.isNullAt(3) && rf.getString(4) == "none")
  }

  test("cusumChangepointByKey: independent shifts located per key") {
    // key A shifts 2->10 after day 5; key B shifts 8->2 after day 3
    val rows =
      (1 to 5).flatMap(d => Seq.fill(2)(("A", f"2024-01-$d%02d 12:00:00"))) ++
      (6 to 10).flatMap(d => Seq.fill(10)(("A", f"2024-01-$d%02d 12:00:00"))) ++
      (1 to 3).flatMap(d => Seq.fill(8)(("B", f"2024-01-$d%02d 12:00:00"))) ++
      (4 to 10).flatMap(d => Seq.fill(2)(("B", f"2024-01-$d%02d 12:00:00")))
    val df = rows.toDF("k", "s")
      .select(col("k"), col("s").cast("timestamp").as("ts"))
    val out = StatTests.cusumChangepointByKey(df, "ts", "k")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getDate(2).toString == "2024-01-05")
    assert(out("A").getDouble(4) == 2.0 && out("A").getDouble(5) == 10.0)
    assert(out("B").getDate(2).toString == "2024-01-03")
    assert(out("B").getDouble(4) == 8.0 && out("B").getDouble(5) == 2.0)
  }

  test("proportionZTest: hand-computed z and the 4/10 Wilson interval") {
    val a = (Seq.fill(4)(true) ++ Seq.fill(6)(false)).toDF("s")
    val b = (Seq.fill(1)(true) ++ Seq.fill(9)(false)).toDF("s")
    val r = StatTests.proportionZTest(a, b, "s").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 4L && r.getLong(3) == 1L)
    // pool = 0.25, se = sqrt(0.25*0.75*0.2), z = 0.3/se
    assert(math.abs(r.getDouble(7) - 0.3 / math.sqrt(0.0375)) < 1e-9)
    // classic Wilson 95% CI for 4/10: (0.1682, 0.6873)
    assert(math.abs(r.getDouble(8) - 0.16818) < 1e-4)
    assert(math.abs(r.getDouble(9) - 0.68732) < 1e-4)
    // degenerate pool (all failures on both sides) -> NULL z
    val z0 = StatTests.proportionZTest(
      Seq(false, false).toDF("s"), Seq(false).toDF("s"), "s").collect().head
    assert(z0.isNullAt(7))
  }

  test("permutationTestMeanDiff: identical samples p = 1, separated samples reject") {
    val ids = (1 to 30)
    val same = ids.map(i => (i.toLong, 5.0)).toDF("id", "v")
    val r = StatTests.permutationTestMeanDiff(same, same, "id", "v", nPerms = 50)
      .collect().head
    // observed gap 0 and every relabeling also 0 -> all perms >= observed
    assert(r.getDouble(2) == 0.0 && r.getLong(4) == 50L &&
      math.abs(r.getDouble(5) - 1.0) < 1e-12)
    val lo = ids.map(i => (i.toLong, 0.0)).toDF("id", "v")
    val hi = ids.map(i => (i.toLong, 100.0)).toDF("id", "v")
    val sep = StatTests.permutationTestMeanDiff(lo, hi, "id", "v", nPerms = 200)
      .collect().head
    assert(sep.getDouble(2) == 100.0)
    assert(sep.getDouble(5) < 0.05,
      s"fully separated samples must reject, p = ${sep.getDouble(5)}")
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val e = StatTests.permutationTestMeanDiff(same, empty, "id", "v", nPerms = 10)
      .collect().head
    assert(e.isNullAt(2) && e.isNullAt(5))
  }

  test("bootstrapMeanCI: interval brackets the mean, tightens with n, reproducible") {
    val small = (1 to 40).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val r = StatTests.bootstrapMeanCI(small, "id", "v", reps = 100).collect().head
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket mean $mean")
    assert(lo < hi, "non-degenerate data gives a non-degenerate interval")
    // determinism: same seed -> identical interval, different seed -> valid too
    val r2 = StatTests.bootstrapMeanCI(small, "id", "v", reps = 100).collect().head
    assert(r2.getDouble(3) == lo && r2.getDouble(4) == hi)
    // 4x the sample (same distribution) -> narrower interval
    val big = (1 to 160).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val rb = StatTests.bootstrapMeanCI(big, "id", "v", reps = 100).collect().head
    assert(rb.getDouble(4) - rb.getDouble(3) < hi - lo,
      "quadrupled sample must tighten the CI")
    // constant data -> zero-width interval at the constant
    val const = (1 to 20).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val rc = StatTests.bootstrapMeanCI(const, "id", "v", reps = 50).collect().head
    assert(rc.getDouble(3) == 7.0 && rc.getDouble(4) == 7.0)
  }

  test("cuped: perfect covariate removes all variance; independent removes none") {
    // y = 2x + 5 exactly: theta = 2, adjusted variance 0, reduction 1
    val perfect = (1 to 20).map(i => (i.toDouble, 2.0 * i + 5)).toDF("x", "y")
    val r = StatTests.cuped(perfect, "x", "y").collect().head
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-9)
    assert(math.abs(r.getDouble(4)) < 1e-9 &&
      math.abs(r.getDouble(5) - 1.0) < 1e-9)
    // constant covariate: NULL theta, variance unchanged
    val const = (1 to 10).map(i => (1.0, i.toDouble)).toDF("x", "y")
    val rc = StatTests.cuped(const, "x", "y").collect().head
    assert(rc.isNullAt(1))
    assert(rc.getDouble(4) == rc.getDouble(3))
    // hand check of the identity on a small sample: var_adj = vy - cov^2/vx
    val mixed = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (4.0, 4.0)).toDF("x", "y")
    val rm = StatTests.cuped(mixed, "x", "y").collect().head
    val (vx, vy, cov) = (5.0 / 3, 10.0 / 3, 5.0 / 3) // var_samp/covar_samp by hand
    assert(math.abs(rm.getDouble(1) - cov / vx) < 1e-9)
    assert(math.abs(rm.getDouble(4) - (vy - cov * cov / vx)) < 1e-9)
  }

  test("jsDivergence: hand-computed mix, identical = 0, disjoint = ln 2") {
    val a = Seq("x", "x", "y", "y").toDF("c")
    val b = Seq("x", "x", "x", "y").toDF("c")
    val r = Drift.jsDivergence(a, b, "c").collect().head
    val expect = 0.5 * (0.5 * math.log(0.5 / 0.625) + 0.5 * math.log(0.5 / 0.375)) +
      0.5 * (0.75 * math.log(0.75 / 0.625) + 0.25 * math.log(0.25 / 0.375))
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - expect) < 1e-12)
    assert(math.abs(r.getDouble(4) - expect / math.log(2.0)) < 1e-12)
    val same = Drift.jsDivergence(a, a, "c").collect().head
    assert(math.abs(same.getDouble(3)) < 1e-15)
    val disj = Drift.jsDivergence(Seq("x").toDF("c"), Seq("y").toDF("c"), "c")
      .collect().head
    assert(math.abs(disj.getDouble(3) - math.log(2.0)) < 1e-12)
  }

  test("cliffsDelta: hand cases and a naive pairwise reference") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 2.0).toDF("v")
    val r = StatTests.cliffsDelta(a, b, "v").collect().head
    assert(r.getAs[Double]("gt") == 2.0 && r.getAs[Double]("lt") == 2.0 &&
      r.getAs[Double]("ties") == 2.0)
    assert(r.getAs[Double]("delta") == 0.0)
    assert(r.getAs[Double]("p_superiority") == 0.5)
    // full separation
    val sep = StatTests.cliffsDelta(Seq(5.0, 6.0).toDF("v"), Seq(1.0).toDF("v"), "v")
      .collect().head
    assert(sep.getAs[Double]("delta") == 1.0)
    // empty side -> NULLs
    val e = StatTests.cliffsDelta(a, Seq.empty[Double].toDF("v"), "v").collect().head
    assert(e.isNullAt(e.fieldIndex("delta")))
    // seeded naive reference
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(40)(rnd.nextInt(9).toDouble)
    val ys = Seq.fill(55)(rnd.nextInt(9).toDouble)
    val got = StatTests.cliffsDelta(xs.toDF("v"), ys.toDF("v"), "v").collect().head
    val gt = (for (x <- xs; y <- ys if x > y) yield 1).size
    val lt = (for (x <- xs; y <- ys if x < y) yield 1).size
    val ties = (for (x <- xs; y <- ys if x == y) yield 1).size
    assert(got.getAs[Double]("gt") == gt.toDouble &&
      got.getAs[Double]("lt") == lt.toDouble &&
      got.getAs[Double]("ties") == ties.toDouble)
    val pairs = xs.size.toDouble * ys.size
    assert(math.abs(got.getAs[Double]("delta") - (gt - lt) / pairs) < 1e-12)
    assert(math.abs(got.getAs[Double]("p_superiority") - (gt + 0.5 * ties) / pairs) < 1e-12)
  }

  test("wasserstein1: hand case, zero self-distance, sorted-quantile reference") {
    // b = a + 1 pointwise -> W1 = 1 exactly
    val r = Drift.wasserstein1(Seq(0.0, 1.0).toDF("v"),
      Seq(1.0, 2.0).toDF("v"), "v").collect().head
    assert(r.getAs[Double]("w1") == 1.0)
    assert(r.getAs[Long]("n_values") == 3L)
    assert(math.abs(r.getAs[Double]("w1_norm") - 0.5) < 1e-15)
    val self = Drift.wasserstein1(Seq(1.0, 5.0, 9.0).toDF("v"),
      Seq(1.0, 5.0, 9.0).toDF("v"), "v").collect().head
    assert(self.getAs[Double]("w1") == 0.0)
    // constant equal columns: single merged value, w1 = 0, norm undefined
    val const = Drift.wasserstein1(Seq(3.0, 3.0).toDF("v"),
      Seq(3.0).toDF("v"), "v").collect().head
    assert(const.getAs[Double]("w1") == 0.0 &&
      const.isNullAt(const.fieldIndex("w1_norm")))
    // equal-size samples: W1 = mean |x_(i) - y_(i)| over sorted pairs
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(60)(rnd.nextInt(40).toDouble)
    val ys = Seq.fill(60)((rnd.nextInt(40) + 5).toDouble)
    val got = Drift.wasserstein1(xs.toDF("v"), ys.toDF("v"), "v")
      .collect().head.getAs[Double]("w1")
    val ref = xs.sorted.zip(ys.sorted).map { case (x, y) => math.abs(x - y) }
      .sum / 60.0
    assert(math.abs(got - ref) < 1e-9, s"w1 $got vs sorted-pair ref $ref")
  }

  test("wilcoxonSignedRank: textbook ranks, tie correction, zero-drop") {
    // diffs 1.5, -0.5, 2, 3, -1 -> |d| ranks .5:1, 1:2, 1.5:3, 2:4, 3:5
    // W+ = 3+4+5 = 12, W- = 3, mu = 7.5, var = 13.75
    val d = Seq((1.5, 0.0), (0.0, 0.5), (2.0, 0.0), (3.0, 0.0), (0.0, 1.0),
      (4.0, 4.0)) // the zero pair drops
      .toDF("x", "y")
    val r = StatTests.wilcoxonSignedRank(d, "x", "y").collect().head
    assert(r.getAs[Long]("n_pairs") == 6L && r.getAs[Long]("n_nonzero") == 5L)
    assert(r.getAs[Double]("w_plus") == 12.0 && r.getAs[Double]("w_minus") == 3.0)
    assert(math.abs(r.getAs[Double]("z") - 4.5 / math.sqrt(13.75)) < 1e-12)
    // naive reference with heavy integer ties
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(120)((rnd.nextInt(8).toDouble, rnd.nextInt(8).toDouble))
    val got = StatTests.wilcoxonSignedRank(rows.toDF("x", "y"), "x", "y")
      .collect().head
    val ds = rows.map(p => p._1 - p._2).filter(_ != 0)
    val absSorted = ds.map(math.abs).sorted
    def rank(a: Double) =
      (absSorted.count(_ < a) * 2 + absSorted.count(_ == a) + 1) / 2.0
    val wpRef = ds.filter(_ > 0).map(x => rank(math.abs(x))).sum
    assert(math.abs(got.getAs[Double]("w_plus") - wpRef) < 1e-9)
    val n = ds.size.toDouble
    val ties = absSorted.groupBy(identity).values
      .map(g => { val t = g.size.toDouble; t * t * t - t }).sum
    val zRef = (wpRef - n * (n + 1) / 4) /
      math.sqrt(n * (n + 1) * (2 * n + 1) / 24 - ties / 48)
    assert(math.abs(got.getAs[Double]("z") - zRef) < 1e-9)
  }

  test("icc1: clone groups give 1, hand-checked balanced case") {
    val clones = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0),
      ("c", 2.0), ("c", 2.0)).toDF("g", "v")
    val r = StatTests.icc1(clones, "g", "v").collect().head
    assert(r.getAs[Double]("ms_within") == 0.0)
    assert(math.abs(r.getAs[Double]("icc1") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("k0") - 2.0) < 1e-12)
    // balanced two-group case vs hand algebra
    val two = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 9.0)).toDF("g", "v")
    val r2 = StatTests.icc1(two, "g", "v").collect().head
    // group means 2 and 7, grand 4.5: ssb = 2*(2-4.5)^2 + 2*(7-4.5)^2 = 25
    // ssw = (1-2)^2+(3-2)^2+(5-7)^2+(9-7)^2 = 10; msb = 25, msw = 5
    assert(math.abs(r2.getAs[Double]("ms_between") - 25.0) < 1e-9)
    assert(math.abs(r2.getAs[Double]("ms_within") - 5.0) < 1e-9)
    assert(math.abs(r2.getAs[Double]("icc1") - (25.0 - 5) / (25 + 5)) < 1e-9)
  }

  test("dickeyFuller: closed-form OLS by hand; degenerate guards") {
    import spark.implicits._
    // y = 1,2,1,3,1 -> pairs x=(1,2,1,3), dy=(1,-1,2,-2):
    // gamma = -20/11, se = sqrt(20)/11, t = -sqrt(20)
    val r = StatTests.dickeyFuller(
      Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (4L, 1L)).toDF("t", "y"),
      "t", "y").collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getAs[Double]("gamma") - (-20.0 / 11)) < 1e-12)
    assert(math.abs(r.getAs[Double]("se_gamma") - math.sqrt(20) / 11) < 1e-12)
    assert(math.abs(r.getAs[Double]("df_stat") + math.sqrt(20)) < 1e-12)
    assert(r.getAs[Boolean]("stationary_5pct"))
    // constant lag level: cxx = 0 -> NULL stats
    val const = StatTests.dickeyFuller(
      Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("t", "y"),
      "t", "y").collect().head
    assert(const.isNullAt(1) && const.isNullAt(3))
    // a perfect fit (rss = 0 -> se = 0) refuses a t-ratio
    val exact = StatTests.dickeyFuller(
      Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)).toDF("t", "y"),
      "t", "y").collect().head
    assert(exact.isNullAt(3))
    // too short
    assert(StatTests.dickeyFuller(Seq((0L, 1L), (1L, 2L)).toDF("t", "y"),
      "t", "y").collect().head.isNullAt(1))
  }

  test("changepointMean: scaled-CUSUM argmax by hand; tie and guard edges") {
    import spark.implicits._
    // 0,0,0 -> 6,6,6: the k = 3 split scores |0 - 9|/sqrt(9/6)
    val step = Seq((10L, 0L), (11L, 0L), (12L, 0L), (13L, 6L), (14L, 6L),
      (15L, 6L)).toDF("t", "y")
    val r = StatTests.changepointMean(step, "t", "y").collect().head
    assert(r.getLong(1) == 12L && r.getLong(2) == 3L)
    assert(math.abs(r.getAs[Double]("stat") - 9.0 / math.sqrt(1.5)) < 1e-9)
    assert(r.getAs[Double]("mean_before") == 0.0)
    assert(r.getAs[Double]("mean_after") == 6.0)
    // constant series: every split scores 0 -> earliest hour wins
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("t", "y")
    val rf = StatTests.changepointMean(flat, "t", "y").collect().head
    assert(rf.getLong(1) == 1L && rf.getAs[Double]("stat") == 0.0)
    // too short
    assert(StatTests.changepointMean(flat.limit(2), "t", "y")
      .collect().head.isNullAt(1))
  }

  test("yuenTrimmedTest: hand trimmed/winsorized algebra; outlier immunity") {
    import spark.implicits._
    // A = (1,2,3,4,100), B = (0,2,4,6,1000), f = 0.2 -> t = 1, h = 3:
    // tmA = 3, tmB = 4, dA = 2/3, dB = 8/3, T = -1/sqrt(10/3),
    // df = (10/3)^2 / ((4/9 + 64/9)/2) = 100/34
    val a = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x")
    val b = Seq(0.0, 2.0, 4.0, 6.0, 1000.0).toDF("x")
    val r = StatTests.yuenTrimmedTest(a, b, "x", trimFrac = 0.2).collect().head
    assert(r.getLong(0) == 5L && r.getLong(2) == 3L)
    assert(math.abs(r.getAs[Double]("trimmed_mean_a") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("trimmed_mean_b") - 4.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_stat") + 1 / math.sqrt(10.0 / 3)) < 1e-12)
    assert(math.abs(r.getAs[Double]("df") - 100.0 / 34) < 1e-12)
    // the outliers moved the raw means by ~20x and Yuen by nothing:
    // same T with the outliers made 100x wilder
    val a2 = Seq(1.0, 2.0, 3.0, 4.0, 10000.0).toDF("x")
    val b2 = Seq(0.0, 2.0, 4.0, 6.0, 100000.0).toDF("x")
    val r2 = StatTests.yuenTrimmedTest(a2, b2, "x", trimFrac = 0.2).collect().head
    assert(r2.getAs[Double]("t_stat") == r.getAs[Double]("t_stat"))
    // ties split across the trim boundary stay rank-exact
    val at = Seq(1.0, 2.0, 2.0, 3.0, 100.0).toDF("x")
    val rt = StatTests.yuenTrimmedTest(at, b, "x", trimFrac = 0.2).collect().head
    assert(math.abs(rt.getAs[Double]("trimmed_mean_a") - 7.0 / 3) < 1e-12)
    // too small after trimming -> NULL stats
    val tiny = Seq(1.0, 2.0, 3.0).toDF("x")
    assert(StatTests.yuenTrimmedTest(tiny, b, "x", trimFrac = 0.34)
      .collect().head.isNullAt(4))
  }

  test("qiniDeciles: hand cumulative uplift; empty-control NULL") {
    import spark.implicits._
    // cut at score 2 -> top bin {3,4}, bottom {1,2}
    val d = Seq((1, 1L, 4.0), (0, 0L, 3.0), (1, 0L, 2.0), (0, 1L, 1.0))
      .toDF("t", "y", "s")
    val out = StatTests.qiniDeciles(d, "t", "y", "s", bins = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(out(1) == ((1L, 1L, 1L, 0L, Some(1.0))))
    assert(out(2) == ((2L, 2L, 1L, 1L, Some(0.0))))
    // all-treated top decile: no control yet -> NULL qini, next fills in
    val skew = Seq((1, 1L, 4.0), (1, 0L, 3.0), (0, 0L, 2.0), (0, 1L, 1.0))
      .toDF("t", "y", "s")
    val o2 = StatTests.qiniDeciles(skew, "t", "y", "s", bins = 2)
      .collect().sortBy(_.getInt(0))
    assert(o2(0).isNullAt(6))
    assert(o2(1).getDouble(6) == 0.0) // 1 - 1*(2/2)
    // empty input yields an empty frame
    assert(StatTests.qiniDeciles(d.filter(col("t") < 0), "t", "y", "s",
      bins = 2).count() == 0)
  }

  test("grangerLag1: rational-exact two-OLS F by hand; guards") {
    import spark.implicits._
    // x = (1,2,1,3,2,4), y = (0,2,3,1,5,3): centered moments are small
    // rationals -> beta_own = -10/69, beta_cross = 119/69, F = 14161/222
    val s = Seq((0L, 1L, 0L), (1L, 2L, 2L), (2L, 1L, 3L), (3L, 3L, 1L),
      (4L, 2L, 5L), (5L, 4L, 3L)).toDF("t", "x", "y")
    val r = StatTests.grangerLag1(s, "t", "x", "y").collect().head
    assert(r.getLong(0) == 5L && r.getLong(4) == 2L)
    assert(math.abs(r.getAs[Double]("beta_own") - (-10.0 / 69)) < 1e-9)
    assert(math.abs(r.getAs[Double]("beta_cross") - 119.0 / 69) < 1e-9)
    assert(math.abs(r.getAs[Double]("f") - 14161.0 / 222) < 1e-9)
    assert(r.getAs[Boolean]("granger_5pct"))
    // y_t = x_{t-1} exactly: perfect unrestricted fit refuses the ratio
    val perfect = Seq((0L, 1L, 9L), (1L, 2L, 1L), (2L, 1L, 2L),
      (3L, 3L, 1L), (4L, 2L, 3L), (5L, 4L, 2L)).toDF("t", "x", "y")
    assert(StatTests.grangerLag1(perfect, "t", "x", "y")
      .collect().head.isNullAt(3))
    // constant own-lag level degenerates, short series degenerates
    val flat = Seq((0L, 1L, 7L), (1L, 2L, 7L), (2L, 1L, 7L), (3L, 3L, 7L),
      (4L, 2L, 7L), (5L, 4L, 7L)).toDF("t", "x", "y")
    assert(StatTests.grangerLag1(flat, "t", "x", "y")
      .collect().head.isNullAt(1))
    assert(StatTests.grangerLag1(s.limit(4), "t", "x", "y")
      .collect().head.isNullAt(1))
  }

  test("periodogramPower: aligned sinusoid carries frac ~1; naive reference") {
    // pure cos(2*pi*t/8) over 8 full cycles: the period-8 line owns the
    // variance (frac = 1 exactly under Fourier alignment)
    val wave = (0 until 64).map(t => (t.toLong, math.cos(2 * math.Pi * t / 8)))
    val rows = StatTests.periodogramPower(wave.toDF("t", "y"), "t", "y",
      Seq(8, 5)).collect().map(r => r.getAs[Int]("period") -> r).toMap
    assert(math.abs(rows(8).getAs[Double]("frac") - 1.0) < 1e-9)
    assert(rows(5).getAs[Double]("frac") < 0.05)
    // naive reference on seeded noise
    val rnd = new scala.util.Random(47)
    val ys = (0 until 100).map(_ => rnd.nextInt(9).toDouble)
    val got = StatTests.periodogramPower(
      ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }.toDF("t", "y"),
      "t", "y", Seq(7)).collect().head
    val mu = ys.sum / ys.size
    val c = ys.zipWithIndex.map { case (y, t) =>
      (y - mu) * math.cos(2 * math.Pi / 7 * t) }.sum
    val sRef = ys.zipWithIndex.map { case (y, t) =>
      (y - mu) * math.sin(2 * math.Pi / 7 * t) }.sum
    assert(math.abs(got.getAs[Double]("c") - c) < 1e-9)
    assert(math.abs(got.getAs[Double]("s") - sRef) < 1e-9)
    assert(math.abs(got.getAs[Double]("power") - (c * c + sRef * sRef)) < 1e-6)
  }

  test("hurstRS: hand block R/S; random walk persists above white noise") {
    // block [1,2,3,4]: cums -1.5,-2,-1.5,0 -> R=2; sigma=sqrt(1.25)
    val rep = (0 until 32).flatMap(_ => Seq(1.0, 2.0, 3.0, 4.0))
    val series = rep.zipWithIndex.map { case (y, t) => (t.toLong, y) }
    val r4 = StatTests.hurstRS(series.toDF("t", "y"), "t", "y", Seq(4, 8, 16, 32))
      .collect().map(r => r.getAs[Int]("b") -> r).toMap
    assert(math.abs(r4(4).getAs[Double]("mean_rs") - 2.0 / math.sqrt(1.25)) < 1e-9)
    assert(r4(4).getAs[Long]("n_blocks") == 32L)
    // persistence ordering: a random walk's H sits well above white noise's
    val rnd = new scala.util.Random(53)
    val steps = Seq.fill(512)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val walk = steps.scanLeft(0.0)(_ + _).drop(1)
    val noise = Seq.fill(512)(rnd.nextInt(11).toDouble)
    def h(ys: Seq[Double]) = StatTests.hurstRS(
      ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }.toDF("t", "y"),
      "t", "y").collect().head.getAs[Double]("hurst")
    val (hw, hn) = (h(walk), h(noise))
    assert(hw > 0.75, s"random walk H $hw")
    assert(hw > hn + 0.15, s"walk $hw must out-persist noise $hn")
  }

  test("overdispersionTest: Poisson-ish accepts, clumped counts reject") {
    // geometric-ish clumped counts: variance >> mean
    val clumped = Seq.fill(150)(0.0) ++ Seq.fill(50)(8.0)
    val r = StatTests.overdispersionTest(clumped.toDF("c"), "c").collect().head
    assert(r.getAs[Double]("dispersion") > 3, "clumped must overdisperse")
    assert(r.getAs[Double]("z") > 5)
    // hand algebra
    val n = clumped.size.toDouble
    val m = clumped.sum / n
    val v = clumped.map(x => (x - m) * (x - m)).sum / (n - 1)
    assert(math.abs(r.getAs[Double]("chi2") - (n - 1) * v / m) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") -
      (math.sqrt(2 * (n - 1) * v / m) - math.sqrt(2 * (n - 1) - 1))) < 1e-9)
    // near-Poisson sample (binomial with small p): |z| modest
    val rnd = new scala.util.Random(19)
    val pois = Seq.fill(400)((1 to 60).count(_ => rnd.nextInt(20) == 0).toDouble)
    val rp = StatTests.overdispersionTest(pois.toDF("c"), "c").collect().head
    assert(math.abs(rp.getAs[Double]("z")) < 3, s"z ${rp.getAs[Double]("z")}")
    // zero-mean degenerate
    val zero = Seq.fill(10)(0.0).toDF("c")
    assert(StatTests.overdispersionTest(zero, "c").collect().head.isNullAt(4))
  }

  test("covariateBalance: hand SMD, balanced randomization near zero") {
    val a = Seq((10.0, 1.0), (14.0, 3.0)).toDF("x1", "x2") // m=12, v=8; m=2, v=2
    val b = Seq((8.0, 2.0), (10.0, 2.0)).toDF("x1", "x2")  // m=9,  v=2; m=2, v=0
    val rows = Drift.covariateBalance(a, b, Seq("x1", "x2"))
      .collect().map(r => r.getAs[String]("covariate") -> r).toMap
    val x1 = rows("x1")
    assert(math.abs(x1.getAs[Double]("smd") - (12.0 - 9) / math.sqrt((8.0 + 2) / 2)) < 1e-12)
    assert(math.abs(x1.getAs[Double]("var_ratio") - 4.0) < 1e-12)
    // x2: var_b = 0 -> ratio NULL; pooled var = 1 > 0 -> smd defined
    val x2 = rows("x2")
    assert(x2.isNullAt(x2.fieldIndex("var_ratio")))
    assert(math.abs(x2.getAs[Double]("smd") - 0.0) < 1e-12)
    // a fair md5-ish split of one population balances
    val pop = (1 to 2000).map(i => (i % 97 + 0.0, (i * 7 % 31) + 0.0))
    val (ca, cb) = pop.zipWithIndex.partition(_._2 % 2 == 0)
    val bal = Drift.covariateBalance(
      ca.map(_._1).toDF("x1", "x2"), cb.map(_._1).toDF("x1", "x2"),
      Seq("x1", "x2")).collect()
    bal.foreach(r => assert(math.abs(r.getAs[Double]("smd")) < 0.1,
      s"${r.getAs[String]("covariate")} smd ${r.getAs[Double]("smd")}"))
  }

  test("energyDistance: Szekely identity vs naive pairwise expectations") {
    val rnd = new scala.util.Random(29)
    val xs = Seq.fill(50)(rnd.nextInt(20).toDouble)
    val ys = Seq.fill(70)((rnd.nextInt(20) + 4).toDouble)
    val got = Drift.energyDistance(xs.toDF("v"), ys.toDF("v"), "v")
      .collect().head
    def meanAbs(u: Seq[Double], w: Seq[Double]) =
      (for (x <- u; y <- w) yield math.abs(x - y)).sum / (u.size.toDouble * w.size)
    val e2Ref = 2 * meanAbs(xs, ys) - meanAbs(xs, xs) - meanAbs(ys, ys)
    assert(math.abs(got.getAs[Double]("e2") - e2Ref) < 1e-9,
      s"e2 ${got.getAs[Double]("e2")} vs pairwise $e2Ref")
    assert(math.abs(got.getAs[Double]("e") - math.sqrt(e2Ref)) < 1e-9)
    // identical samples: exactly zero
    val same = Drift.energyDistance(xs.toDF("v"), xs.toDF("v"), "v")
      .collect().head
    assert(same.getAs[Double]("e2") == 0.0)
  }

  test("maseBacktest: weekly structure scores below 1; constant -> NULL") {
    // strong period-7 pattern with noise-free repetition
    val weekly = (0 until 70).map(t => (t.toLong, (t % 7 * 3).toDouble))
    val r = StatTests.maseBacktest(weekly.toDF("t", "y"), "t", "y", season = 7)
      .collect().head
    assert(r.getAs[Double]("mae_seasonal") == 0.0)
    assert(r.getAs[Double]("mase") == 0.0)
    assert(r.getAs[Long]("n_scored") == 63L)
    // hand check on a short series: y = [1,2,4,8,16,32], season=2
    // seasonal errs at t=2..5: |4-1|,|8-2|,|16-4|,|32-8| = 3,6,12,24 -> 11.25
    // naive1 errs same rows:    |4-2|,|8-4|,|16-8|,|32-16| = 2,4,8,16 -> 7.5
    val s = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0).zipWithIndex
      .map { case (y, t) => (t.toLong, y) }
    val r2 = StatTests.maseBacktest(s.toDF("t", "y"), "t", "y", season = 2)
      .collect().head
    assert(math.abs(r2.getAs[Double]("mae_seasonal") - 11.25) < 1e-12)
    assert(math.abs(r2.getAs[Double]("mae_naive1") - 7.5) < 1e-12)
    assert(math.abs(r2.getAs[Double]("mase") - 1.5) < 1e-12)
    val const = (0 until 20).map(t => (t.toLong, 5.0))
    val rc = StatTests.maseBacktest(const.toDF("t", "y"), "t", "y", season = 7)
      .collect().head
    assert(rc.isNullAt(rc.fieldIndex("mase")))
  }

  test("cramerVonMises matches a naive per-observation reference") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(70)(rnd.nextInt(15).toDouble)
    val ys = Seq.fill(90)((rnd.nextInt(15) + 2).toDouble)
    val got = Drift.cramerVonMises(xs.toDF("v"), ys.toDF("v"), "v")
      .collect().head
    val (m, n) = (xs.size.toDouble, ys.size.toDouble); val bigN = m + n
    def fa(z: Double) = xs.count(_ <= z) / m
    def fb(z: Double) = ys.count(_ <= z) / n
    val s = (xs ++ ys).map(z => math.pow(fa(z) - fb(z), 2)).sum
    val tRef = m * n / (bigN * bigN) * s
    assert(math.abs(got.getAs[Double]("t") - tRef) < 1e-10,
      s"t ${got.getAs[Double]("t")} vs $tRef")
    assert(math.abs(got.getAs[Double]("t_expected") - (1 + 1 / bigN) / 6) < 1e-14)
    // a genuine shift must standardize well above the null
    assert(got.getAs[Double]("z") > 3)
    // identical samples: T = 0 exactly, z below its null mean
    val same = Drift.cramerVonMises(xs.toDF("v"), xs.toDF("v"), "v")
      .collect().head
    assert(same.getAs[Double]("t") == 0.0 && same.getAs[Double]("z") < 0)
  }

  test("proportionEffects: hand-computed panel on a 2x2") {
    val a = (Seq.fill(30)(true) ++ Seq.fill(70)(false)).toDF("s")
    val b = (Seq.fill(20)(true) ++ Seq.fill(80)(false)).toDF("s")
    val r = StatTests.proportionEffects(a, b, "s").collect().head
    assert(r.getAs[Double]("p_a") == 0.3 && r.getAs[Double]("p_b") == 0.2)
    assert(math.abs(r.getAs[Double]("risk_ratio") - 1.5) < 1e-12)
    val zc = 1.959963984540054
    val rrSe = math.sqrt(1.0 / 30 - 1.0 / 100 + 1.0 / 20 - 1.0 / 100)
    assert(math.abs(r.getAs[Double]("rr_lo") - 1.5 * math.exp(-zc * rrSe)) < 1e-9)
    assert(math.abs(r.getAs[Double]("odds_ratio") - (30.0 * 80) / (20.0 * 70)) < 1e-12)
    assert(math.abs(r.getAs[Double]("risk_diff") - 0.1) < 1e-12)
    val h = 2 * math.asin(math.sqrt(0.3)) - 2 * math.asin(math.sqrt(0.2))
    assert(math.abs(r.getAs[Double]("cohens_h") - h) < 1e-12)
    // zero-success side: rr is a true 0, but every log-scale CI is NULL
    val z = StatTests.proportionEffects(Seq(false, false).toDF("s"), b, "s")
      .collect().head
    assert(z.getAs[Double]("risk_ratio") == 0.0)
    assert(z.isNullAt(z.fieldIndex("rr_lo")) &&
      z.isNullAt(z.fieldIndex("odds_ratio")) &&
      z.isNullAt(z.fieldIndex("or_lo")))
    assert(math.abs(z.getAs[Double]("risk_diff") - (-0.2)) < 1e-12)
  }

  test("dagostinoK2 matches a definitional-central-moment reference") {
    val rnd = new scala.util.Random(5)
    // rounded gaussian-ish sample — the raw-power-sum algebra in the
    // operator must agree with direct Σ(x−m)^k central moments here
    val xs = Seq.fill(200)(math.round(50 + 10 * rnd.nextGaussian()).toDouble)
    val r = StatTests.dagostinoK2(xs.toDF("v"), "v").collect().head
    val n = xs.size; val nd = n.toDouble
    val m = xs.sum / n
    val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
    val g1 = m3 / math.pow(m2, 1.5); val b2 = m4 / (m2 * m2)
    assert(math.abs(r.getAs[Double]("g1") - g1) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - b2) < 1e-9)
    // the transformed zs, independently recomputed
    val y = g1 * math.sqrt((nd + 1) * (nd + 3) / (6 * (nd - 2)))
    val beta2 = 3 * (nd * nd + 27 * nd - 70) * (nd + 1) * (nd + 3) /
      ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9))
    val w2 = -1 + math.sqrt(2 * (beta2 - 1))
    val z1 = (1 / math.sqrt(math.log(math.sqrt(w2)))) *
      math.log(y / math.sqrt(2 / (w2 - 1)) +
        math.sqrt(y * y * (w2 - 1) / 2 + 1))
    assert(math.abs(r.getAs[Double]("z_skew") - z1) < 1e-9,
      s"z1 ${r.getAs[Double]("z_skew")} vs $z1")
    assert(r.getAs[Double]("k2") >= 0)
    assert(math.abs(r.getAs[Double]("p_value") -
      math.exp(-r.getAs[Double]("k2") / 2)) < 1e-12)
    // a gaussian sample should NOT be rejected wildly
    assert(r.getAs[Double]("p_value") > 0.01)
    // uniform data: platykurtic — kurtosis z strongly negative
    val unif = (1 to 500).map(_.toDouble)
    val ru = StatTests.dagostinoK2(unif.toDF("v"), "v").collect().head
    assert(ru.getAs[Double]("z_kurt") < -3)
    // edges: constant and tiny n
    assert(StatTests.dagostinoK2(Seq.fill(20)(7.0).toDF("v"), "v")
      .collect().head.isNullAt(5))
    assert(StatTests.dagostinoK2(Seq(1.0, 2.0, 3.0).toDF("v"), "v")
      .collect().head.isNullAt(5))
  }

  test("ljungBox matches a naive ACF reference; alternating series rejects") {
    val rnd = new scala.util.Random(9)
    val ys = Seq.fill(120)(rnd.nextInt(10).toDouble)
    val series = ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }
      .toDF("t", "y")
    val r = StatTests.ljungBox(series, "t", "y", maxLag = 6).collect().head
    val n = ys.size; val mu = ys.sum / n
    val ss = ys.map(y => (y - mu) * (y - mu)).sum
    def rk(k: Int) = (k until n).map(t => (ys(t) - mu) * (ys(t - k) - mu)).sum / ss
    val qRef = n.toDouble * (n + 2) *
      (1 to 6).map(k => rk(k) * rk(k) / (n - k)).sum
    assert(math.abs(r.getAs[Double]("r1") - rk(1)) < 1e-12)
    assert(math.abs(r.getAs[Double]("q_stat") - qRef) < 1e-9)
    // closed-form chi2(6) survival cross-check
    val q = r.getAs[Double]("q_stat")
    val pRef = math.exp(-q / 2) * (1 + q / 2 + q * q / 8)
    assert(math.abs(r.getAs[Double]("p_value") - pRef) < 1e-12)
    // white noise should usually not reject at extreme levels
    assert(r.getAs[Double]("p_value") > 1e-4)
    // strict alternation: r1 ~ -1, Q huge, p ~ 0
    val alt = (0 until 100).map(t => (t.toLong, (t % 2).toDouble)).toDF("t", "y")
    val ra = StatTests.ljungBox(alt, "t", "y", maxLag = 4).collect().head
    assert(ra.getAs[Double]("r1") < -0.9)
    assert(ra.getAs[Double]("p_value") < 1e-10)
    // constant series -> NULLs
    val const = (0 until 50).map(t => (t.toLong, 3.0)).toDF("t", "y")
    assert(StatTests.ljungBox(const, "t", "y", maxLag = 4).collect().head.isNullAt(3))
  }

  test("jarqueBera matches a definitional reference; skewed data rejects") {
    val xs = (1 to 400).map(i => math.pow(i % 21 + 1, 2).toDouble)
    val r = StatTests.jarqueBera(xs.toDF("x"), "x").collect().head
    // naive central-moment reference
    val n = xs.length.toDouble
    val mu = xs.sum / n
    def m(k: Int) = xs.map(v => math.pow(v - mu, k)).sum / n
    val g1 = m(3) / math.pow(m(2), 1.5)
    val b2 = m(4) / (m(2) * m(2))
    val jb = n / 6 * (g1 * g1 + (b2 - 3) * (b2 - 3) / 4)
    assert(r.getLong(0) == 400L)
    assert(math.abs(r.getAs[Double]("g1") - g1) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") - b2) < 1e-9)
    assert(math.abs(r.getAs[Double]("jb") - jb) < 1e-6)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-jb / 2)) < 1e-12)
    assert(r.getAs[Double]("p_value") < 0.01, "quadratic ramp is skewed")
    // symmetric near-normal data (full-factorial sum of 4 base-5 digits:
    // exactly zero skew, excess kurtosis -1.3/4) keeps JB in the accept
    // region at n = 625
    val tri = (0 until 625).map(i =>
      (i % 5 + i / 5 % 5 + i / 25 % 5 + i / 125 % 5).toDouble)
    val rt = StatTests.jarqueBera(tri.toDF("x"), "x").collect().head
    assert(math.abs(rt.getAs[Double]("g1")) < 1e-9, "factorial sum is symmetric")
    assert(rt.getAs[Double]("p_value") > 0.05,
      s"near-normal sum should not reject: ${rt.getAs[Double]("p_value")}")
    // constant column -> NULLs
    assert(StatTests.jarqueBera(Seq(5.0, 5.0, 5.0).toDF("x"), "x")
      .collect().head.isNullAt(3))
  }

  test("bartlettTest: equal variances accept, 10x variance rejects, hand ref") {
    // three groups with identical shapes -> statistic ~ 0
    val eq = (0 until 300).map(i => (s"g${i % 3}", (i / 3 % 20).toDouble))
    val re = StatTests.bartlettTest(eq.toDF("g", "v"), "g", "v").collect().head
    assert(re.getLong(1) == 3L)
    assert(math.abs(re.getAs[Double]("statistic")) < 1e-9)
    assert(re.getAs[Double]("p_value") > 0.999)
    // one group scaled 5x in spread (25x variance) -> reject
    val un = (0 until 300).map { i =>
      val g = i % 3
      (s"g$g", (i / 3 % 20).toDouble * (if (g == 0) 5 else 1))
    }
    val ru = StatTests.bartlettTest(un.toDF("g", "v"), "g", "v").collect().head
    assert(ru.getAs[Double]("p_value") < 1e-6)
    // definitional reference on the unequal case
    val byG = un.groupBy(_._1).values.toSeq.map { rows =>
      val vs = rows.map(_._2)
      val ng = vs.length
      val mean = vs.sum / ng
      (ng, vs.map(v => (v - mean) * (v - mean)).sum / (ng - 1))
    }
    val nTot = byG.map(_._1).sum
    val k = byG.size
    val sp2 = byG.map { case (ng, v) => (ng - 1) * v }.sum / (nTot - k)
    val t0 = (nTot - k) * math.log(sp2) -
      byG.map { case (ng, v) => (ng - 1) * math.log(v) }.sum
    val c = 1.0 + (byG.map(g => 1.0 / (g._1 - 1)).sum - 1.0 / (nTot - k)) /
      (3.0 * (k - 1))
    assert(math.abs(ru.getAs[Double]("statistic") - t0 / c) < 1e-8)
    // a zero-variance group -> NULL statistic
    val z = (0 until 60).map(i => (s"g${i % 2}",
      if (i % 2 == 0) 7.0 else (i % 10).toDouble))
    assert(StatTests.bartlettTest(z.toDF("g", "v"), "g", "v")
      .collect().head.isNullAt(3))
    // single-rating groups drop: only one group survives -> NULLs
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0), ("b", 5.0))
    assert(StatTests.bartlettTest(tiny.toDF("g", "v"), "g", "v")
      .collect().head.getLong(1) == 1L)
  }

  test("moodMedianTest: hand 2x2 chi2, constant NULL, lower-median contract") {
    // g0 all below the grand median, g1 all above: maximal separation
    val df = ((1 to 10).map(i => ("g0", i.toDouble)) ++
      (1 to 10).map(i => ("g1", 100.0 + i))).toDF("g", "v")
    val r = StatTests.moodMedianTest(df, "g", "v").collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 2L)
    // lower median of 1..10,101..110 = value at rank 10 = 10.0
    assert(r.getAs[Double]("grand_median") == 10.0)
    // cells: g0 (a=0, l=10), g1 (a=10, l=0); every e = 5 -> chi2 = 20
    assert(math.abs(r.getAs[Double]("chi2") - 20.0) < 1e-9)
    assert(r.getAs[Double]("p_value") < 1e-4)
    // identical groups: chi2 ~ small, p large
    val same = (0 until 200).map(i => (s"g${i % 2}", (i / 2 % 10).toDouble))
    val rs = StatTests.moodMedianTest(same.toDF("g", "v"), "g", "v").collect().head
    assert(math.abs(rs.getAs[Double]("chi2")) < 1e-9)
    assert(rs.getAs[Double]("p_value") > 0.999)
    // constant column: everything <= median -> NULL chi2
    val c = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(StatTests.moodMedianTest(c, "g", "v").collect().head.isNullAt(3))
    // odd n: lower median of {1,2,3} is 2
    val odd = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    assert(StatTests.moodMedianTest(odd, "g", "v")
      .collect().head.getAs[Double]("grand_median") == 2.0)
  }

  test("runsTestByKey: alternating vs block series, equal-to-mean drop") {
    // alternating 0/10 around mean 5: maximal runs -> strongly positive z
    val alt = (0 until 40).map(i => ("a", i.toLong, if (i % 2 == 0) 0.0 else 10.0))
    // block series: 20 lows then 20 highs -> 2 runs -> strongly negative z
    val blk = (0 until 40).map(i => ("b", i.toLong, if (i < 20) 0.0 else 10.0))
    val df = (alt ++ blk).toDF("k", "t", "v")
    val out = StatTests.runsTestByKey(df, "k", Seq("t"), "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(3) == 40L, "alternation = one run per value")
    assert(out("a").getAs[Double]("z") > 5.0)
    assert(out("b").getLong(3) == 2L)
    assert(out("b").getAs[Double]("z") < -5.0)
    // hand z for the block case: n1 = n2 = 20, R = 2
    val mu = 2.0 * 20 * 20 / 40 + 1
    val v2 = 2.0 * 20 * 20 * (2.0 * 20 * 20 - 40) / (40.0 * 40 * 39)
    assert(math.abs(out("b").getAs[Double]("z") - (2 - mu) / math.sqrt(v2)) < 1e-12)
    // values equal to the key mean drop; constant key vanishes
    val mixed = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 2.0),
      ("c", 4L, 8.0), ("d", 1L, 7.0), ("d", 2L, 7.0)).toDF("k", "t", "v")
    val rows = StatTests.runsTestByKey(mixed, "k", Seq("t"), "v").collect()
    assert(rows.map(_.getString(0)).toSet == Set("c"), "constant key drops")
    val rc = rows.head
    assert(rc.getLong(1) == 1L && rc.getLong(2) == 1L, "equal-to-mean drops")
  }

  test("durbinWatson: exact OLS recovery, hand DW, degenerate guards") {
    // residuals orthogonal to x and zero-mean: OLS recovers (2, 3) exactly
    // and the residuals equal e, so DW = sum(de^2)/sum(e^2) = 18/8
    val e = Seq(1.0, -1.0, -1.0, 1.0, 0.0, 0.0, 1.0, -1.0, -1.0, 1.0)
    val rows = e.zipWithIndex.map { case (ei, t) =>
      ("a", t.toLong, t.toDouble, 2.0 + 3.0 * t + ei)
    }
    val r = StatTests.durbinWatson(rows.toDF("k", "t", "x", "y"),
      "k", Seq("t"), "x", "y").collect().head
    assert(r.getLong(1) == 10L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("dw") - 18.0 / 8.0) < 1e-9)
    // perfect fit: NULL dw, exact coefficients
    val fit = (0 until 8).map(t => ("b", t.toLong, t.toDouble, 5.0 - 2.0 * t))
    val rf = StatTests.durbinWatson(fit.toDF("k", "t", "x", "y"),
      "k", Seq("t"), "x", "y").collect().head
    assert(math.abs(rf.getAs[Double]("slope") + 2.0) < 1e-9)
    assert(rf.isNullAt(rf.fieldIndex("dw")))
    // constant x: NULL slope/intercept/dw
    val cx = (0 until 5).map(t => ("c", t.toLong, 1.0, t.toDouble))
    val rc = StatTests.durbinWatson(cx.toDF("k", "t", "x", "y"),
      "k", Seq("t"), "x", "y").collect().head
    assert(rc.isNullAt(rc.fieldIndex("slope")) &&
      rc.isNullAt(rc.fieldIndex("dw")))
  }

  test("breuschPagan: naive two-pass reference; fan-shaped noise rejects") {
    // heteroscedastic: noise amplitude grows with x
    val het = (0 until 400).map { i =>
      val x = (i / 4).toDouble
      (x, 1.0 + 0.5 * x + (if (i % 2 == 0) 1 else -1) * 0.1 * x)
    }
    val r = StatTests.breuschPagan(het.toDF("x", "y"), "x", "y").collect().head
    assert(r.getAs[Double]("p_value") < 1e-6, "fan noise must reject")
    // naive reference of the same construction
    val n = het.size.toDouble
    val (sx, sy) = (het.map(_._1).sum, het.map(_._2).sum)
    val sxx = het.map(p => p._1 * p._1).sum
    val sxy = het.map(p => p._1 * p._2).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val u = het.map { case (x, y) => (x, math.pow(y - a - b * x, 2)) }
    val (su, sxu, suu) = (u.map(_._2).sum, u.map(p => p._1 * p._2).sum,
      u.map(p => p._2 * p._2).sum)
    val lmRef = n * math.pow(n * sxu - sx * su, 2) /
      ((n * sxx - sx * sx) * (n * suu - su * su))
    assert(math.abs(r.getAs[Double]("lm") - lmRef) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope") - b) < 1e-9)
    // homoscedastic noise (same +-1/+-2 pattern at every x): u is
    // uncorrelated with x by construction, LM = 0, p ~ 1
    val pat = Seq(1.0, -1.0, 2.0, -2.0)
    val hom = (0 until 400).map { i =>
      val x = (i / 4).toDouble
      (x, 1.0 + 0.5 * x + pat(i % 4))
    }
    val rh = StatTests.breuschPagan(hom.toDF("x", "y"), "x", "y").collect().head
    assert(rh.getAs[Double]("p_value") > 0.5,
      s"flat noise must accept: ${rh.getAs[Double]("p_value")}")
    // constant x: NULL lm
    val cx = (0 until 10).map(i => (1.0, i.toDouble))
    assert(StatTests.breuschPagan(cx.toDF("x", "y"), "x", "y")
      .collect().head.isNullAt(3))
  }

  test("bayesianAB: closed-form 2/3 case, symmetry, dominant winner") {
    // A unobserved (uniform prior), B = 1/1 success -> Beta(2,1):
    // P(B > A) = integral 2x * x dx = 2/3 exactly
    val d1 = Seq(("b", 1)).toDF("arm", "ok")
    val r1 = StatTests.bayesianAB(d1, "arm", "ok", "a", "b").collect().head
    assert(r1.getLong(0) == 0L && r1.getLong(2) == 1L && r1.getLong(3) == 1L)
    assert(math.abs(r1.getAs[Double]("prob_b_gt_a") - 2.0 / 3.0) < 1e-4)
    assert(math.abs(r1.getAs[Double]("mean_b") - 2.0 / 3.0) < 1e-12)
    // identical arms: P = 1/2 by symmetry
    val d2 = ((1 to 40).map(i => ("a", i % 3 min 1)) ++
      (1 to 40).map(i => ("b", i % 3 min 1))).toDF("arm", "ok")
    val r2 = StatTests.bayesianAB(d2, "arm", "ok", "a", "b").collect().head
    assert(math.abs(r2.getAs[Double]("prob_b_gt_a") - 0.5) < 1e-4)
    // B dominates: P ~ 1; other event types are ignored
    val d3 = ((1 to 50).map(_ => ("a", 0)) ++ (1 to 50).map(_ => ("b", 1)) ++
      (1 to 9).map(_ => ("c", 1))).toDF("arm", "ok")
    val r3 = StatTests.bayesianAB(d3, "arm", "ok", "a", "b").collect().head
    assert(r3.getAs[Double]("prob_b_gt_a") > 0.999)
    assert(r3.getLong(0) == 50L && r3.getLong(1) == 0L)
  }

  test("ewmaBacktest matches the sequential smoothing recursion") {
    val ys = Seq(10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 8.0, 15.0)
    val df = ys.zipWithIndex.map { case (y, t) => (t.toLong + 100, y) }
      .toDF("t", "y") // offset start: k derives from t - min(t)
    val alpha = 0.3
    val r = StatTests.ewmaBacktest(df, "t", "y", alpha).collect().head
    // sequential reference: s_0 = y_0, s_t = a*y_t + (1-a)*s_{t-1}
    var s = ys.head
    var (se, sn) = (0.0, 0.0)
    for (t <- 1 until ys.size) {
      se += math.abs(ys(t) - s)
      sn += math.abs(ys(t) - ys(t - 1))
      s = alpha * ys(t) + (1 - alpha) * s
    }
    assert(r.getLong(0) == 8L && r.getLong(1) == 7L)
    assert(math.abs(r.getAs[Double]("mae_ewma") - se / 7) < 1e-9)
    assert(math.abs(r.getAs[Double]("mae_naive1") - sn / 7) < 1e-9)
    assert(math.abs(r.getAs[Double]("rel_mae") - (se / sn)) < 1e-9)
    // constant series: both MAEs 0, rel NULL
    val c = (0 until 10).map(t => (t.toLong, 5.0)).toDF("t", "y")
    val rc = StatTests.ewmaBacktest(c, "t", "y").collect().head
    // the scaled-prefix form carries ~1e-15 float residue on a constant
    assert(rc.getAs[Double]("mae_ewma") < 1e-9 &&
      rc.isNullAt(rc.fieldIndex("rel_mae")))
    // empty input: zero-row guard
    val re = StatTests.ewmaBacktest(c.filter(col("y") < 0), "t", "y")
      .collect().head
    assert(re.getLong(0) == 0L && re.isNullAt(2))
  }

  test("chiSquareGof: uniform accepts, skew rejects, unknown category fails") {
    val exp = (0 to 3).map(i => (i.toString, 0.25))
    val uni = (0 until 400).map(i => (i % 4).toString).toDF("v")
    val ru = StatTests.chiSquareGof(uni, "v", exp).collect().head
    assert(ru.getLong(0) == 400L && ru.getLong(1) == 4L && ru.getLong(3) == 3L)
    assert(math.abs(ru.getAs[Double]("chi2")) < 1e-12)
    assert(ru.getAs[Double]("p_value") > 0.999)
    // skewed: all mass on one category (others expected but absent)
    val skew = (0 until 400).map(_ => "0").toDF("v")
    val rs = StatTests.chiSquareGof(skew, "v", exp).collect().head
    // chi2 = (400-100)^2/100 + 3*(0-100)^2/100 = 900 + 300 = 1200
    assert(math.abs(rs.getAs[Double]("chi2") - 1200.0) < 1e-9)
    assert(rs.getAs[Double]("p_value") < 1e-10)
    // observed category outside the expected list fails fast
    val bad = Seq("0", "1", "zzz").toDF("v")
    intercept[IllegalArgumentException] {
      StatTests.chiSquareGof(bad, "v", exp).collect()
    }
    // proportions must sum to 1
    intercept[IllegalArgumentException] {
      StatTests.chiSquareGof(uni, "v", Seq(("0", 0.5), ("1", 0.2)))
    }
  }

  test("robustLocation: hand rank algebra, duplicate boundaries, guards") {
    val r = StatTests.robustLocation((1 to 10).map(_.toDouble).toDF("v"), "v",
      trimFrac = 0.2).collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L)
    assert(math.abs(r.getAs[Double]("mean") - 5.5) < 1e-12)
    // kept ranks 3..8 -> values 3..8, mean 5.5
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 5.5) < 1e-12)
    // winsorized: 3,3,3,4,5,6,7,8,8,8 -> 5.5
    assert(math.abs(r.getAs[Double]("winsorized_mean") - 5.5) < 1e-12)
    assert(r.getAs[Double]("median") == 5.0, "lower median of 1..10")
    // duplicates straddling the trim boundary
    val d = Seq(1.0, 1.0, 1.0, 5.0, 9.0, 9.0, 9.0).toDF("v")
    val rd = StatTests.robustLocation(d, "v", trimFrac = 0.2).collect().head
    assert(rd.getLong(1) == 1L)
    assert(math.abs(rd.getAs[Double]("trimmed_mean") - 5.0) < 1e-12)
    assert(math.abs(rd.getAs[Double]("winsorized_mean") - 5.0) < 1e-12)
    assert(rd.getAs[Double]("median") == 5.0)
    // trimFrac 0 degrades to the plain mean
    val r0 = StatTests.robustLocation(d, "v", trimFrac = 0.0).collect().head
    assert(math.abs(r0.getAs[Double]("trimmed_mean") -
      r0.getAs[Double]("mean")) < 1e-12)
    // over-trimming a tiny input -> NULLs
    val tiny = Seq(1.0, 2.0).toDF("v")
    val rt = StatTests.robustLocation(tiny, "v", trimFrac = 0.49).collect().head
    assert(!rt.isNullAt(rt.fieldIndex("mean")))
  }

  test("kuiperTest: identical ~ 0, disjoint V = 1, V >= KS") {
    val a = (1 to 200).map(i => (i % 50).toDouble).toDF("x")
    val b = (1 to 200).map(i => (i % 50).toDouble).toDF("x")
    val ri = Drift.kuiperTest(a, b, "x").collect().head
    assert(math.abs(ri.getAs[Double]("v")) < 1e-12)
    assert(ri.getAs[Double]("p_value") > 0.999)
    // disjoint supports: one direction saturates at 1, the other is 0
    val lo = Seq(1.0, 2.0, 3.0).toDF("x")
    val hi = Seq(10.0, 11.0).toDF("x")
    val rd = Drift.kuiperTest(lo, hi, "x").collect().head
    assert(rd.getAs[Double]("d_plus") == 1.0 && rd.getAs[Double]("d_minus") == 0.0)
    assert(rd.getAs[Double]("v") == 1.0)
    // V dominates the KS D on a shifted pair
    val s1 = (1 to 300).map(i => (i % 60).toDouble).toDF("x")
    val s2 = (1 to 300).map(i => (i % 60 + 20).toDouble).toDF("x")
    val rv = Drift.kuiperTest(s1, s2, "x").collect().head
    val ks = Drift.ksStatistic(s1, s2, "x").collect().head.getAs[Double]("ks")
    assert(rv.getAs[Double]("v") >= ks - 1e-9)
    assert(rv.getAs[Double]("p_value") < 1e-6)
    // empty side -> NULLs
    val re = Drift.kuiperTest(lo.filter(col("x") < 0), hi, "x").collect().head
    assert(re.isNullAt(re.fieldIndex("v")))
  }

  test("pAdjust: hand bonferroni/holm/bh, monotonicity, NULL passthrough") {
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.04), ("d", 0.2))
      .toDF("id", "p")
    def adj(method: String) = StatTests.pAdjust(df, "p", method).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p_adjusted")).toMap
    val bf = adj("bonferroni")
    assert(math.abs(bf("a") - 0.04) < 1e-12 && math.abs(bf("d") - 0.8) < 1e-12)
    val hm = adj("holm")
    assert(math.abs(hm("a") - 0.04) < 1e-12)
    assert(math.abs(hm("b") - 0.06) < 1e-12)
    assert(math.abs(hm("c") - 0.08) < 1e-12)
    assert(math.abs(hm("d") - 0.2) < 1e-12)
    val bh = adj("bh")
    assert(math.abs(bh("a") - 0.04) < 1e-12)
    assert(math.abs(bh("b") - 0.04) < 1e-12)
    assert(math.abs(bh("c") - 0.04 * 4 / 3) < 1e-12)
    assert(math.abs(bh("d") - 0.2) < 1e-12)
    // clamping at 1 and NULL passthrough
    val withNull = Seq(("a", Some(0.9)), ("b", Some(0.8)), ("c", None))
      .toDF("id", "p")
    val rn = StatTests.pAdjust(withNull, "p", "bonferroni").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rn("a").getAs[Double]("p_adjusted") == 1.0)
    assert(rn("c").isNullAt(rn("c").fieldIndex("p_adjusted")))
    intercept[IllegalArgumentException] { StatTests.pAdjust(df, "p", "what") }
  }

  test("andersonDarling2 matches a naive reference; sigma vs brute-force g") {
    val as = Seq(3.0, 7.0, 7.0, 12.0, 15.0, 18.0, 21.0)
    val bs = Seq(5.0, 7.0, 9.0, 14.0, 14.0, 22.0)
    val r = Drift.andersonDarling2(as.toDF("x"), bs.toDF("x"), "x")
      .collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 6L)
    // naive A2akN from sorted pooled distinct values
    val pooled = (as ++ bs).distinct.sorted
    val nA = as.size; val nB = bs.size; val nn = nA + nB
    var (ca, cb, sa, sb) = (0.0, 0.0, 0.0, 0.0)
    for (v <- pooled) {
      val la = as.count(_ == v); val lb = bs.count(_ == v)
      val l = (la + lb).toDouble
      ca += la; cb += lb
      val baj = ca + cb - l / 2
      val den = baj * (nn - baj) - nn * l / 4
      if (den > 0) {
        sa += l * math.pow(nn * (ca - la / 2.0) - nA * baj, 2) / den
        sb += l * math.pow(nn * (cb - lb / 2.0) - nB * baj, 2) / den
      }
    }
    val a2Ref = (nn - 1.0) / nn * (sa / nA + sb / nB) / nn
    assert(math.abs(r.getAs[Double]("a2") - a2Ref) < 1e-9)
    // sigma against the brute-force O(N^2) g (validates the u-fold)
    val h = (1 until nn).map(1.0 / _).sum
    var g = 0.0
    for (i <- 1 to nn - 2; j <- i + 1 to nn - 1) g += 1.0 / ((nn - i) * j.toDouble)
    val bigH = 1.0 / nA + 1.0 / nB
    val aa = (4 * g - 6) + (10 - 6 * g) * bigH
    val bb = (2 * g - 4) * 4 + 16 * h + (2 * g - 14 * h - 4) * bigH - 8 * h + 4 * g - 6
    val cc = (6 * h + 2 * g - 2) * 4 + (4 * h - 4 * g + 6) * 2 + (2 * h - 6) * bigH + 4 * h
    val dd = (2 * h + 6) * 4 - 8 * h
    val v2 = (aa * math.pow(nn, 3) + bb * nn * nn + cc * nn + dd) /
      ((nn - 1.0) * (nn - 2) * (nn - 3))
    assert(math.abs(r.getAs[Double]("sigma") - math.sqrt(v2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("t_stat") -
      (a2Ref - 1) / math.sqrt(v2)) < 1e-9)
    // clearly different distributions: t_stat far above the 1% point
    val big1 = (1 to 200).map(i => (i % 40).toDouble).toDF("x")
    val big2 = (1 to 200).map(i => (i % 40 + 30).toDouble).toDF("x")
    assert(Drift.andersonDarling2(big1, big2, "x").collect().head
      .getAs[Double]("t_stat") > 10.0)
    // constant pooled column -> NULL
    val c1 = Seq(5.0, 5.0).toDF("x"); val c2 = Seq(5.0).toDF("x")
    assert(Drift.andersonDarling2(c1, c2, "x").collect().head.isNullAt(2))
  }

  test("digamma/trigamma closed-form harmonics match direct summation") {
    // h = H_{N−1} = ψ(N) + γ; g collapses via the Euler-sum identity to
    // H_N^(2) − 2H_{N−1}/N − 1/N². Pin both against the former O(N)
    // loops across small (recurrence path) and large (series path) N.
    for (n <- Seq(4L, 5L, 9L, 10L, 11L, 137L, 10000L, 1234567L)) {
      val hLoop = (1L until n).foldLeft(0.0)((acc, i) => acc + 1.0 / i)
      val hClosed = Drift.digamma(n.toDouble) + Drift.EulerGamma
      assert(math.abs(hClosed - hLoop) <= 1e-11 * math.max(1.0, hLoop),
        s"H_{N-1} mismatch at N=$n: $hClosed vs $hLoop")
      var g = 0.0; var hm = 0.0; var m = 1L
      while (m <= n - 2) { hm += 1.0 / m; g += (hLoop - hm) / (n - m); m += 1 }
      val h2 = math.Pi * math.Pi / 6 - Drift.trigamma(n.toDouble + 1)
      val gClosed = h2 - 2.0 * hClosed / n - 1.0 / (n.toDouble * n)
      assert(math.abs(gClosed - g) <= 1e-10 * math.max(1.0, g),
        s"g mismatch at N=$n: $gClosed vs $g")
    }
  }

  test("dunnTest: naive rank reference, Holm family, degenerate guards") {
    // three groups with ties across groups; verify against a direct
    // O(n log n) reference: sort, average ranks, pairwise z
    val data = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
      ("b", 2.0), ("b", 6.0), ("b", 7.0), ("b", 8.0),
      ("c", 9.0), ("c", 10.0), ("c", 10.0), ("c", 12.0))
    val out = StatTests.dunnTest(data.toDF("g", "v"), "g", "v").collect()
      .map(r => ((r.getString(0), r.getString(1)), r)).toMap
    assert(out.size == 3 && out.keySet ==
      Set(("a", "b"), ("a", "c"), ("b", "c")))
    // reference ranks
    val vs = data.map(_._2).sorted
    def avgRank(v: Double): Double = {
      val idx = vs.zipWithIndex.filter(_._1 == v).map(_._2 + 1)
      idx.sum.toDouble / idx.size
    }
    val byG = data.groupBy(_._1).map { case (g, xs) =>
      g -> (xs.size, xs.map(x => avgRank(x._2)).sum / xs.size)
    }
    val n = data.size
    val tieMass = data.map(_._2).groupBy(identity).values
      .map(_.size.toDouble).map(t => t * t * t - t).sum
    val sigma2 = (n * (n + 1.0) - tieMass / (n - 1)) / 12.0
    for (((ga, gb), r) <- out) {
      val (na, ra) = byG(ga); val (nb, rb) = byG(gb)
      val z = (ra - rb) / math.sqrt(sigma2 * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9, s"z for $ga/$gb")
      assert(math.abs(r.getAs[Double]("mean_rank_a") - ra) < 1e-9)
      val p = math.min(1.0, 2.0 * Drift.normalSfAS(math.abs(z)))
      assert(math.abs(r.getAs[Double]("p_value") - p) < 1e-12)
    }
    // Holm across the 3-pair family: sorted ascending, multipliers 3,2,1
    // with the running max — recompute directly
    val ps = out.toSeq.map { case (k, r) => k -> r.getAs[Double]("p_value") }
      .sortBy(_._2)
    var run = 0.0
    val expHolm = ps.zipWithIndex.map { case ((k, p), i) =>
      run = math.max(run, (3 - i) * p); k -> math.min(1.0, run)
    }.toMap
    for ((k, h) <- expHolm)
      assert(math.abs(out(k).getAs[Double]("p_holm") - h) < 1e-12, s"holm $k")
    // all-tied: sigma2 = 0 -> NULL z/p
    val tied = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0))
    val tr = StatTests.dunnTest(tied.toDF("g", "v"), "g", "v").collect().head
    assert(tr.isNullAt(tr.fieldIndex("z")) && tr.isNullAt(tr.fieldIndex("p_value")))
    // single group: empty pair table
    assert(StatTests.dunnTest(Seq(("a", 1.0)).toDF("g", "v"), "g", "v").count() == 0)
  }

  test("pAdjust BY: harmonic penalty, monotonicity, clamp") {
    val df = Seq(0.01, 0.02, 0.03, 0.2).toDF("p")
    val h4 = 1.0 + 1.0 / 2 + 1.0 / 3 + 1.0 / 4
    val got = StatTests.pAdjust(df, "p", "by").collect()
      .map(r => r.getDouble(0) -> r.getAs[Double]("p_adjusted")).toMap
    // BY = BH x H_4 with the running-min monotonicity; here raw values
    // are already monotone: 0.01*4/1*H, 0.02*4/2*H, 0.03*4/3*H, 0.2*4/4*H
    assert(math.abs(got(0.01) - 0.01 * 4 * h4) < 1e-12)
    assert(math.abs(got(0.02) - 0.02 * 2 * h4) < 1e-12)
    assert(math.abs(got(0.03) - 0.03 * 4.0 / 3 * h4) < 1e-12)
    assert(math.abs(got(0.2) - math.min(1.0, 0.2 * h4)) < 1e-12)
    // BH unchanged by the shared code path
    val bh = StatTests.pAdjust(df, "p", "bh").collect()
      .map(r => r.getDouble(0) -> r.getAs[Double]("p_adjusted")).toMap
    assert(math.abs(bh(0.01) - 0.04) < 1e-12)
    intercept[IllegalArgumentException] { StatTests.pAdjust(df, "p", "nope") }
  }

  test("jonckheereTerpstra: naive pairwise reference with ties, trend power") {
    // ordered groups with a monotone trend AND cross-group ties
    val data = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0),
      ("b", 2.0), ("b", 3.0), ("b", 5.0), ("b", 5.0),
      ("c", 4.0), ("c", 5.0), ("c", 6.0), ("c", 8.0))
    val r = StatTests.jonckheereTerpstra(data.toDF("g", "v"), "g", "v")
      .collect().head
    // naive J*: over ordered group pairs, #(x_a < x_b) + 0.5 #(x_a = x_b)
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val order = Seq("a", "b", "c")
    var jRef = 0.0
    for (i <- order.indices; l <- (i + 1) until order.size;
         xa <- byG(order(i)); xb <- byG(order(l))) {
      if (xa < xb) jRef += 1.0 else if (xa == xb) jRef += 0.5
    }
    assert(math.abs(r.getAs[Double]("j_stat") - jRef) < 1e-9,
      s"J ${r.getAs[Double]("j_stat")} vs naive $jRef")
    // mean under H0: (N^2 - sum n_i^2)/4
    val n = data.size
    val meanRef = (n * n - byG.values.map(x => x.size * x.size).sum) / 4.0
    assert(math.abs(r.getAs[Double]("mean_j") - meanRef) < 1e-9)
    // tie-corrected variance (Hollander-Wolfe) recomputed directly
    val nsz = order.map(byG(_).size.toDouble)
    val tms = data.map(_._2).groupBy(identity).values.map(_.size.toDouble)
    val aT = n.toDouble * (n - 1) * (2 * n + 5) -
      nsz.map(x => x * (x - 1) * (2 * x + 5)).sum -
      tms.map(t => t * (t - 1) * (2 * t + 5)).sum
    val bT = nsz.map(x => x * (x - 1) * (x - 2)).sum *
      tms.map(t => t * (t - 1) * (t - 2)).sum
    val cT = nsz.map(x => x * (x - 1)).sum * tms.map(t => t * (t - 1)).sum
    val varRef = aT / 72.0 + bT / (36.0 * n * (n - 1) * (n - 2)) +
      cT / (8.0 * n * (n - 1))
    assert(math.abs(r.getAs[Double]("var_j") - varRef) < 1e-9)
    val zRef = (jRef - meanRef) / math.sqrt(varRef)
    assert(math.abs(r.getAs[Double]("z") - zRef) < 1e-9)
    assert(zRef > 2.0, "monotone trend must push z well positive")
    // custom order reverses the sign
    val rev = StatTests.jonckheereTerpstra(data.toDF("g", "v"), "g", "v",
      groupOrder = Seq("c", "b", "a")).collect().head
    assert(math.abs(rev.getAs[Double]("z") + zRef) < 1e-9)
    // power contrast: kruskalWallis-style unordered shuffles score lower —
    // a trend-free permutation of the same values has |z| near 0
    val flat = Seq(("a", 1.0), ("a", 8.0), ("b", 2.0), ("b", 6.0),
      ("c", 1.0), ("c", 7.0))
    val zf = StatTests.jonckheereTerpstra(flat.toDF("g", "v"), "g", "v")
      .collect().head.getAs[Double]("z")
    assert(math.abs(zf) < 1.0)
    // all tied -> NULL z/p; unknown group in groupOrder -> require
    val tied = Seq(("a", 1.0), ("b", 1.0), ("c", 1.0)).toDF("g", "v")
    val tr = StatTests.jonckheereTerpstra(tied, "g", "v").collect().head
    assert(tr.isNullAt(tr.fieldIndex("z")))
    intercept[IllegalArgumentException] {
      StatTests.jonckheereTerpstra(tied, "g", "v", groupOrder = Seq("a", "b"))
    }
  }

  test("welchAnova: direct-formula reference, variance-heterogeneity, guards") {
    val data = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 14.0), ("b", 18.0),
      ("c", 5.0), ("c", 5.5), ("c", 6.0), ("c", 6.5), ("c", 7.0))
    val r = StatTests.welchAnova(data.toDF("g", "v"), "g", "v").collect().head
    // reference from raw lists (definitional mean/variance, not the
    // moment identities the operator uses)
    val groups = Seq("a", "b", "c").map(g => data.filter(_._1 == g).map(_._2))
    val ms = groups.map(x => x.sum / x.size)
    val vs = groups.zip(ms).map { case (x, m) =>
      x.map(v => (v - m) * (v - m)).sum / (x.size - 1) }
    val wi = groups.zip(vs).map { case (x, v) => x.size / v }
    val ww = wi.sum
    val mbar = wi.zip(ms).map { case (w, m) => w * m }.sum / ww
    val k = 3
    val aRef = wi.zip(ms).map { case (w, m) => w * (m - mbar) * (m - mbar) }
      .sum / (k - 1)
    val h = wi.zip(groups).map { case (w, x) =>
      math.pow(1 - w / ww, 2) / (x.size - 1) }.sum
    val fRef = aRef / (1 + 2.0 * (k - 2) / (k * k - 1.0) * h)
    val df2Ref = (k * k - 1.0) / (3 * h)
    assert(r.getLong(0) == 12L && r.getLong(1) == 3L && r.getLong(3) == 2L)
    assert(math.abs(r.getAs[Double]("f") - fRef) < 1e-9,
      s"f ${r.getAs[Double]("f")} vs $fRef")
    assert(math.abs(r.getAs[Double]("df2") - df2Ref) < 1e-9)
    assert(fRef > 10.0, "separated groups must reject")
    // a group of size 1 -> NULL f; a zero-variance group -> NULL f
    val small = (data :+ (("d", 9.0))).toDF("g", "v")
    assert(StatTests.welchAnova(small, "g", "v").collect().head.isNullAt(2))
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    assert(StatTests.welchAnova(flat, "g", "v").collect().head.isNullAt(2))
    // single group -> NULL with k = 1
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val ro = StatTests.welchAnova(one, "g", "v").collect().head
    assert(ro.getLong(1) == 1L && ro.isNullAt(2))
  }

  test("countModelFit: hand moments, zero inflation, NB guard") {
    // overdispersed, zero-heavy counts: {0,0,0,0,1,1,6,8} -> mu 2, var 10
    val xs = Seq(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 6.0, 8.0)
    val r = StatTests.countModelFit(xs.toDF("c"), "c").collect().head
    assert(r.getLong(0) == 8L)
    assert(math.abs(r.getAs[Double]("mean") - 2.0) < 1e-12)
    val vRef = xs.map(x => (x - 2.0) * (x - 2.0)).sum / 7
    assert(math.abs(r.getAs[Double]("variance") - vRef) < 1e-12)
    assert(math.abs(r.getAs[Double]("zero_frac_obs") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("zero_frac_poisson") - math.exp(-2.0)) < 1e-12)
    // NB branch: variance > mean, so r and its zero mass emit — and the
    // NB zero mass sits far closer to the observed 0.5 than Poisson's
    val nbR = 4.0 / (vRef - 2.0)
    assert(math.abs(r.getAs[Double]("nb_r") - nbR) < 1e-9)
    val zNb = math.pow(nbR / (nbR + 2.0), nbR)
    assert(math.abs(r.getAs[Double]("zero_frac_nb") - zNb) < 1e-9)
    assert(math.abs(zNb - 0.5) < math.abs(math.exp(-2.0) - 0.5))
    // underdispersed (constant-ish): NB columns NULL
    val u = Seq(2.0, 2.0, 2.0, 2.0).toDF("c")
    val ru = StatTests.countModelFit(u, "c").collect().head
    assert(ru.isNullAt(ru.fieldIndex("nb_r")))
  }

  test("seasonalMannKendall: cycle-masked trend caught, pure cycle = none") {
    import java.sql.Timestamp
    def ts(day: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // strong weekly cycle + a monotone drift: plain MK's cross-weekday
    // pairs are dominated by the cycle; the seasonal variant sees the
    // within-weekday monotone rise cleanly
    def build(counts: Int => Int) = (0 until 28).flatMap { d =>
      (0 until counts(d)).map(_ => Tuple1(ts(d)))
    }.toDF("t")
    val trended = build(d => 10 + (d % 7) * 20 + d) // +1 event per day
    val rt = StatTests.seasonalMannKendall(trended, "t", period = 7)
      .collect().head
    assert(rt.getLong(0) == 28L)
    // every within-weekday pair rises: S = 7 seasons * C(4,2) = 42
    assert(rt.getLong(2) == 42L)
    assert(rt.getString(5) == "increasing")
    // pure cycle, no drift: every within-weekday pair ties -> S = 0
    val cyc = build(d => 10 + (d % 7) * 20)
    val rc = StatTests.seasonalMannKendall(cyc, "t", period = 7).collect().head
    assert(rc.getLong(2) == 0L)
    assert(rc.getString(5) == "none")
    // variance: ties collapse each season completely in the pure cycle
    // (ng = 4 tied values -> var contribution 0)
    assert(math.abs(rc.getAs[Double]("var_s")) < 1e-12)
  }

  test("psiQuantile: identical ~ 0, shift detected, outlier robustness") {
    val a = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    val b = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    val ri = Drift.psiQuantile(a, b, "x").collect().head
    assert(ri.getLong(0) == 1000L && ri.getLong(2) == 10L)
    assert(math.abs(ri.getAs[Double]("psi")) < 1e-12)
    // a major shift reads on the usual scale
    val shifted = (1 to 1000).map(i => (i % 100 + 50).toDouble).toDF("x")
    assert(Drift.psiQuantile(a, shifted, "x").collect().head
      .getAs[Double]("psi") > 0.25)
    // THE point of quantile bins: one extreme outlier in the current
    // slice leaves the reference bins untouched — fixed-width PSI would
    // squeeze everything into the bottom bins instead
    val outlier = b.union(Seq(1e9).toDF("x"))
    val rq = Drift.psiQuantile(a, outlier, "x").collect().head
    assert(rq.getAs[Double]("psi") < 0.01,
      s"one outlier must not dominate: ${rq.getAs[Double]("psi")}")
    // empty current: NULL psi
    assert(Drift.psiQuantile(a, b.filter(col("x") < 0), "x")
      .collect().head.isNullAt(3))
  }

  test("effectSizes: hand-computed d/g/glass panel and degenerate guards") {
    val a = Seq(4.0, 6.0, 8.0, 10.0, 12.0).toDF("x") // mean 8, var 10
    val b = Seq(1.0, 3.0, 5.0, 7.0, 9.0).toDF("x")   // mean 5, var 10
    val r = StatTests.effectSizes(a, b, "x").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    assert(math.abs(r.getAs[Double]("diff") - 3.0) < 1e-12)
    val d = 3.0 / math.sqrt(10.0)
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-12)
    assert(math.abs(r.getAs[Double]("hedges_g") - d * (1 - 3.0 / 31)) < 1e-12)
    assert(math.abs(r.getAs[Double]("glass_delta") - d) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_ratio") - 1.0) < 1e-12)
    // constant slices: d/g/glass NULL, diff still present
    val c1 = Seq(2.0, 2.0).toDF("x")
    val c2 = Seq(1.0, 1.0).toDF("x")
    val rc = StatTests.effectSizes(c1, c2, "x").collect().head
    assert(math.abs(rc.getAs[Double]("diff") - 1.0) < 1e-12)
    assert(rc.isNullAt(rc.fieldIndex("cohens_d")) &&
      rc.isNullAt(rc.fieldIndex("var_ratio")))
    // n < 2 on one side -> moments only
    val r1 = StatTests.effectSizes(Seq(3.0).toDF("x"), b, "x").collect().head
    assert(r1.getLong(0) == 1L && r1.isNullAt(r1.fieldIndex("cohens_d")))
  }

  test("quantileTreatmentEffects: rank-exact deciles, tail-only effect located") {
    // control = 1..100, treated = 1..100 with the top 10% scaled x10:
    // every DECILE (q <= 0.9) is identical — the rank-exact cutpoints
    // must stay blind to a strictly-above-the-0.9-rank tail change
    val rows = (1 to 100).map(i => (0L, i.toDouble)) ++
      (1 to 100).map(i => (1L, if (i > 90) i * 10.0 else i.toDouble))
    val out = StatTests.quantileTreatmentEffects(
      rows.toDF("t", "v"), "t", "v").collect()
      .map(r => r.getDouble(0) -> (r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toMap
    assert(out.size == 9)
    (1 to 8).foreach { i =>
      val q = i / 10.0
      // rank ceil(q*100) = 10i -> value 10i on both arms
      assert(out(q)._1 == 10.0 * i && out(q)._3 == 0.0,
        s"decile $q must show no effect: ${out(q)}")
    }
    assert(out(0.9)._1 == 90.0 && out(0.9)._2 == 90.0 && out(0.9)._3 == 0.0)
    // shift every treated value by +5: uniform QTE of 5 at every decile
    val shifted = (1 to 100).map(i => (0L, i.toDouble)) ++
      (1 to 100).map(i => (1L, i + 5.0))
    StatTests.quantileTreatmentEffects(shifted.toDF("t", "v"), "t", "v")
      .collect().foreach(r => assert(r.getDouble(5) == 5.0))
    // empty arm -> NULL qte rows
    val one = (1 to 10).map(i => (1L, i.toDouble))
    val r0 = StatTests.quantileTreatmentEffects(one.toDF("t", "v"),
      "t", "v").collect()
    assert(r0.forall(_.isNullAt(5)))
  }

  test("msprtProportions: closed-form mixture, null stays near 1, effect rejects") {
    // balanced null: identical arms -> delta 0 -> lambda = sqrt(v/(v+tau))
    // < 1 -> p_always clamps to 1
    val nullArms = (1 to 50).flatMap(i =>
      Seq((0L, (i % 5 == 0).compare(false).toLong),
        (1L, (i % 5 == 0).compare(false).toLong)))
    val rn = StatTests.msprtProportions(nullArms.toDF("t", "y"), "t", "y")
      .collect().head
    assert(rn.getAs[Double]("p_always") == 1.0)
    assert(!rn.getAs[Boolean]("reject_05"))
    // strong effect: 5% vs 95% on 200/arm must reject
    val eff = (1 to 200).flatMap(i =>
      Seq((0L, if (i <= 10) 1L else 0L), (1L, if (i <= 190) 1L else 0L)))
    val re = StatTests.msprtProportions(eff.toDF("t", "y"), "t", "y")
      .collect().head
    // hand formula
    val (pa, pb) = (0.05, 0.95); val pp = 0.5
    val v = pp * 0.5 * (2.0 / 200); val tau = 0.0001
    val lam = math.sqrt(v / (v + tau)) *
      math.exp(0.9 * 0.9 * tau / (2 * v * (v + tau)))
    assert(math.abs(re.getAs[Double]("lambda_stat") - lam) < 1e-9)
    assert(re.getAs[Boolean]("reject_05"),
      s"a 90-point lift must reject anytime: $re")
    // empty arm -> NULL
    val r0 = StatTests.msprtProportions(
      Seq((1L, 1L), (1L, 0L)).toDF("t", "y"), "t", "y").collect().head
    assert(r0.isNullAt(r0.fieldIndex("p_always")))
  }

  test("ebShrinkRates: small groups shrink harder; moment prior formula") {
    // big informative group (200 @ 50%), small lucky group (4 @ 100%),
    // mid group (50 @ 30%)
    val d = (Seq.fill(100)(("big", 1L)) ++ Seq.fill(100)(("big", 0L)) ++
      Seq.fill(4)(("tiny", 1L)) ++
      Seq.fill(15)(("mid", 1L)) ++ Seq.fill(35)(("mid", 0L)))
      .toDF("g", "y")
    val out = StatTests.ebShrinkRates(d, "g", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out("tiny")._2 == 1.0)
    assert(out("tiny")._3 < out("big")._3,
      s"the 4-row group must shrink harder: $out")
    // shrunk tiny sits strictly between the grand mean and its raw rate
    val m = (100.0 + 4 + 15) / 254
    assert(out("tiny")._4 > m && out("tiny")._4 < 1.0)
    // reference replay of the moment prior
    val rates = Seq(out("big")._2, out("mid")._2, out("tiny")._2)
    val varHat = rates.map(p => (p - m) * (p - m)).sum / 2.0
    val noise = Seq(200L, 50L, 4L).map(n => m * (1 - m) / n).sum / 3.0
    val t2 = math.max(0.0, varHat - noise)
    val bTiny = t2 / (t2 + m * (1 - m) / 4)
    assert(math.abs(out("tiny")._3 - bTiny) < 1e-12)
  }

  test("regressionAdjustedAte: matches a normal-equations OLS reference") {
    // randomized t, covariate explains most variance, true effect = 2
    val data = Seq(
      (1L, 12L, 1.0), (0L, 10L, 1.0), (1L, 22L, 2.0), (0L, 20L, 2.0),
      (1L, 32L, 3.0), (0L, 30L, 3.0), (1L, 41L, 4.0), (0L, 40L, 4.0),
      (1L, 53L, 5.0), (0L, 50L, 5.0))
    val r = StatTests.regressionAdjustedAte(
      data.toDF("t", "y", "x"), "t", "y", "x").collect().head
    // reference: solve the 3x3 normal equations directly
    val n = data.size.toDouble
    val st = data.map(_._1).sum.toDouble
    val sy = data.map(_._2).sum.toDouble
    val sx = data.map(_._3).sum
    val sty = data.map(d => d._1 * d._2).sum.toDouble
    val stx = data.map(d => d._1 * d._3).sum
    val sxy = data.map(d => d._2 * d._3).sum
    val sxx = data.map(d => d._3 * d._3).sum
    val syy = data.map(d => d._2.toDouble * d._2).sum
    val (ctt, cxx, ctx) = (st - st * st / n, sxx - sx * sx / n,
      stx - st * sx / n)
    val (cty, cxy, cyy) = (sty - st * sy / n, sxy - sx * sy / n,
      syy - sy * sy / n)
    val det = ctt * cxx - ctx * ctx
    val ate = (cty * cxx - ctx * cxy) / det
    val bx = (cxy * ctt - ctx * cty) / det
    val se = math.sqrt(
      (cyy - ate * cty - bx * cxy) / (n - 3) * cxx / det)
    assert(math.abs(r.getAs[Double]("ate") - ate) < 1e-9, s"$r vs $ate")
    assert(math.abs(r.getAs[Double]("beta_covariate") - bx) < 1e-9)
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-9)
    // the adjusted SE must beat the unadjusted two-sample difference SE
    assert(r.getAs[Double]("se") < 2.0,
      "the covariate should absorb most variance here")
    // degenerate: one arm empty -> collinear design -> NULL
    val one = Seq((1L, 5L, 1.0), (1L, 6L, 2.0), (1L, 7L, 3.0),
      (1L, 8L, 4.0)).toDF("t", "y", "x")
    val r0 = StatTests.regressionAdjustedAte(one, "t", "y", "x")
      .collect().head
    assert(r0.isNullAt(r0.fieldIndex("ate")))
  }

  test("hodgesLehmann: brute-force pairwise median + CI ranks") {
    val av = Seq(1.0, 3.0, 5.0, 7.0, 9.0)
    val bv = Seq(4.0, 4.0, 6.0, 10.0, 12.0, 14.0)
    val r = StatTests.hodgesLehmann(av.toDF("v"), bv.toDF("v"), "v")
      .collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 6L && r.getLong(2) == 30L)
    // brute force: all 30 differences b - a, sorted
    val diffs = (for (x <- av; y <- bv) yield y - x).sorted
    val hlRef = (diffs(14) + diffs(15)) / 2.0 // two middles of 30
    assert(r.getAs[Double]("hl_shift") == hlRef, s"hl: $r vs $hlRef")
    val k = math.floor(15.0 - 1.959963984540054 *
      math.sqrt(5.0 * 6 * 12 / 12.0)).toLong
    assert(r.getAs[Double]("ci_lo") == diffs((k + 1 - 1).toInt))
    assert(r.getAs[Double]("ci_hi") == diffs((30 - k - 1).toInt))
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("hl_shift") &&
      r.getAs[Double]("hl_shift") <= r.getAs[Double]("ci_hi"))
    // pure location shift recovers the shift exactly
    val s2 = StatTests.hodgesLehmann(av.toDF("v"),
      av.map(_ + 2.5).toDF("v"), "v").collect().head
    assert(s2.getAs[Double]("hl_shift") == 2.5)
    // empty side -> NULL
    val r0 = StatTests.hodgesLehmann(
      Seq.empty[Double].toDF("v"), bv.toDF("v"), "v").collect().head
    assert(r0.isNullAt(r0.fieldIndex("hl_shift")))
    // cell-product guard
    intercept[IllegalArgumentException] {
      StatTests.hodgesLehmann(av.toDF("v"), bv.toDF("v"), "v",
        maxPairCells = 10L).collect()
    }
  }

  test("jackknifeRatio: definitional replicates; cluster correlation priced") {
    // deterministic unit bucketing: replay the same md5 buckets and
    // leave-one-out algebra in the test
    val rows = (1L to 200L).flatMap { uid =>
      // unit-level effect: all rows of a user share its value — maximal
      // within-unit correlation
      val v = (uid % 7).toDouble
      Seq.fill(5)((uid, v, 1.0))
    }
    val df = rows.toDF("uid", "num", "den")
    val r = StatTests.jackknifeRatio(df, "uid", "num", "den", buckets = 16)
      .collect().head
    assert(r.getLong(0) == 1000L)
    // reference replay with the same hash
    def bucket(uid: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jk:$uid".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val per = rows.groupBy(t => bucket(t._1))
      .map { case (b, rs) => (b, rs.map(_._2).sum, rs.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    val tn = per.map(_._2).sum; val td = per.map(_._3).sum
    assert(math.abs(r.getAs[Double]("ratio") - tn / td) < 1e-9)
    val reps = per.map { case (_, s, d) => (tn - s) / (td - d) }
    val rbar = reps.sum / reps.size
    val seRef = math.sqrt((reps.size - 1.0) / reps.size *
      reps.map(x => (x - rbar) * (x - rbar)).sum)
    assert(math.abs(r.getAs[Double]("se") - seRef) < 1e-9, s"se: $r")
    assert(math.abs(r.getAs[Double]("ci_hi") -
      (tn / td + 1.959963984540054 * seRef)) < 1e-8)
    // empty input -> NULL stats
    val r0 = StatTests.jackknifeRatio(
      Seq.empty[(Long, Double, Double)].toDF("uid", "num", "den"),
      "uid", "num", "den").collect().head
    assert(r0.isNullAt(r0.fieldIndex("ratio")))
  }

  test("giniConcentration: exact rank formula, ties, top shares, guards") {
    // values 1..10: G = 2*385/(10*55) - 11/10 = 0.3; top-10% = the
    // single largest row = 10/55; top-1% has floor(10/100) = 0 rows
    val r = StatTests.giniConcentration(
      (1L to 10L).toDF("v"), "v").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 55L)
    assert(math.abs(r.getAs[Double]("gini") - 0.3) < 1e-12)
    assert(math.abs(r.getAs[Double]("top10_share") - 10.0 / 55) < 1e-12)
    assert(r.getAs[Double]("top1_share") == 0.0)
    // tied block spans the rank boundary: values (1,1,2), ranks of the
    // 1-block are {1,2} -> N = 1*(1+2) + 2*3 = 9, G = 18/12 - 4/3 = 1/6
    val rt = StatTests.giniConcentration(
      Seq(1L, 1L, 2L).toDF("v"), "v").collect().head
    assert(math.abs(rt.getAs[Double]("gini") - 1.0 / 6) < 1e-12)
    // perfect equality -> 0; full concentration -> (n-1)/n
    val eq = StatTests.giniConcentration(
      Seq.fill(5)(7L).toDF("v"), "v").collect().head
    assert(math.abs(eq.getAs[Double]("gini")) < 1e-12)
    val conc = StatTests.giniConcentration(
      (Seq.fill(9)(0L) :+ 90L).toDF("v"), "v").collect().head
    assert(math.abs(conc.getAs[Double]("gini") - 0.9) < 1e-12)
    assert(math.abs(conc.getAs[Double]("top10_share") - 1.0) < 1e-12)
    // n < 2 -> NULL stats
    val r0 = StatTests.giniConcentration(Seq(5L).toDF("v"), "v")
      .collect().head
    assert(r0.isNullAt(r0.fieldIndex("gini")))
  }

  test("diffInDiff: removes level gap and common shock; Welch reference") {
    // treated start 10 higher (level gap) and everyone gains +3 post
    // (common shock); the true DiD effect is exactly +2 on treated
    val data = (1 to 40).map { i =>
      val t = i % 2; val base = 5L + 10L * t + (i % 4)
      (t.toLong, base, base + 3 + 2 * t)
    }
    val r = StatTests.diffInDiff(data.toDF("t", "pre", "post"),
      "t", "pre", "post").collect().head
    assert(r.getAs[Double]("did") == 2.0, s"did must isolate +2: $r")
    // per-arm changes are constant -> zero variance -> se 0 -> NULL z
    assert(r.isNullAt(r.fieldIndex("z")))
    // noisy version against the hand Welch formula
    val noisy = (1 to 30).map { i =>
      val t = i % 2
      (t.toLong, (i % 5).toLong, (i % 5) + (i % 3) + 2L * t)
    }
    val rn = StatTests.diffInDiff(noisy.toDF("t", "pre", "post"),
      "t", "pre", "post").collect().head
    val d1 = noisy.filter(_._1 == 1).map(x => (x._3 - x._2).toDouble)
    val d0 = noisy.filter(_._1 == 0).map(x => (x._3 - x._2).toDouble)
    def m(xs: Seq[Double]) = xs.sum / xs.size
    def v(xs: Seq[Double]) =
      xs.map(x => (x - m(xs)) * (x - m(xs))).sum / (xs.size - 1)
    val did = m(d1) - m(d0)
    val se = math.sqrt(v(d1) / d1.size + v(d0) / d0.size)
    assert(math.abs(rn.getAs[Double]("did") - did) < 1e-9)
    assert(math.abs(rn.getAs[Double]("se") - se) < 1e-9)
    // cell means are the audit trail
    assert(math.abs(rn.getAs[Double]("pre_treated") - m(
      noisy.filter(_._1 == 1).map(_._2.toDouble))) < 1e-12)
    // an arm with < 2 units -> NULL stats
    val r1 = StatTests.diffInDiff(
      Seq((1L, 1L, 2L), (0L, 1L, 2L), (0L, 2L, 3L))
        .toDF("t", "pre", "post"), "t", "pre", "post").collect().head
    assert(r1.isNullAt(r1.fieldIndex("did")))
  }

  test("powerTwoProportions: textbook design formulas") {
    // 10% vs 14% on 500/arm
    val data = (1 to 500).flatMap(i => Seq(
      (0L, if (i <= 50) 1L else 0L), (1L, if (i <= 70) 1L else 0L)))
    val r = StatTests.powerTwoProportions(data.toDF("t", "y"), "t", "y")
      .collect().head
    val (pa, pb) = (0.1, 0.14); val pp = 0.12
    val se = math.sqrt(pp * 0.88 * (2.0 / 500))
    val zsum = 1.959963985 + 0.8416212336
    assert(math.abs(r.getAs[Double]("p_a") - pa) < 1e-12)
    assert(math.abs(r.getAs[Double]("delta") - 0.04) < 1e-12)
    assert(math.abs(r.getAs[Double]("mde") - zsum * se) < 1e-12)
    val nReq = math.ceil(zsum * zsum * 2 * pp * 0.88 / (0.04 * 0.04)).toLong
    assert(r.getAs[Long]("n_required_per_arm") == nReq)
    // a 4-point lift on 500/arm is underpowered: power < 0.8, so the
    // required n must exceed the current n
    assert(r.getAs[Double]("power_at_n") < 0.8 && nReq > 500)
    // power is monotone in n: 5000/arm must beat 500/arm
    val big = (1 to 5000).flatMap(i => Seq(
      (0L, if (i <= 500) 1L else 0L), (1L, if (i <= 700) 1L else 0L)))
    val rb = StatTests.powerTwoProportions(big.toDF("t", "y"), "t", "y")
      .collect().head
    assert(rb.getAs[Double]("power_at_n") > r.getAs[Double]("power_at_n"))
    // zero delta -> NULL required n, power = alpha/2 tail only
    val eq = (1 to 100).flatMap(i => Seq((0L, i % 5L / 4L), (1L, i % 5L / 4L)))
    val re = StatTests.powerTwoProportions(eq.toDF("t", "y"), "t", "y")
      .collect().head
    assert(re.isNullAt(re.fieldIndex("n_required_per_arm")))
    // empty arm -> NULL stats
    val r0 = StatTests.powerTwoProportions(
      Seq((1L, 1L)).toDF("t", "y"), "t", "y").collect().head
    assert(r0.isNullAt(r0.fieldIndex("p_a")))
  }

  test("srmCheck: chi2 vs the design, the 0.001 bar, guards") {
    // perfect 50/50 -> chi2 0, p 1, no flag
    val ok = (1 to 100).map(i => Tuple1((i % 2).toString)).toDF("arm")
    val rows = StatTests.srmCheck(ok, "arm", Seq("0" -> 0.5, "1" -> 0.5))
      .collect()
    assert(rows.length == 2 && rows.forall(!_.getAs[Boolean]("srm_flag")))
    assert(rows.forall(_.getAs[Double]("chi2") == 0.0))
    // a real mismatch: 5300/4700 on a 50/50 design -> chi2 = 36 ->
    // p ~ 2*Phi(-6) ~ 2e-9 -> flagged
    val bad = ((1 to 5300).map(_ => "a") ++ (1 to 4700).map(_ => "b"))
      .map(Tuple1(_)).toDF("arm")
    val rb = StatTests.srmCheck(bad, "arm", Seq("a" -> 0.5, "b" -> 0.5))
      .collect()
    assert(rb.forall(_.getAs[Boolean]("srm_flag")))
    assert(math.abs(rb.head.getAs[Double]("chi2") - 36.0) < 1e-9)
    assert(rb.head.getAs[Double]("p_value") < 1e-6)
    // missing arm in data is fine (counts 0); unknown arm in data fails
    val missing = StatTests.srmCheck(
      Seq(Tuple1("a")).toDF("arm"), "arm", Seq("a" -> 0.9, "b" -> 0.1))
      .collect()
    assert(missing.length == 2)
    intercept[IllegalArgumentException] {
      StatTests.srmCheck(Seq(Tuple1("zz")).toDF("arm"), "arm",
        Seq("a" -> 1.0)).collect()
    }
    intercept[IllegalArgumentException] {
      StatTests.srmCheck(ok, "arm", Seq("0" -> 0.6, "1" -> 0.6))
    }
  }

  test("oaxacaBlinder: pure composition vs pure structure") {
    // SAME structure y = 10 + 2x in both groups, group A richer in x:
    // the whole gap is composition -> explained = gap, unexplained ~ 0
    val comp = Seq(("a", 14L, 2.0), ("a", 16L, 3.0), ("a", 18L, 4.0),
      ("a", 20L, 5.0), ("b", 10L, 0.0), ("b", 12L, 1.0), ("b", 14L, 2.0),
      ("b", 16L, 3.0))
    val rc = StatTests.oaxacaBlinder(comp.toDF("g", "y", "x"), "g",
      "a", "b", "y", "x").collect().head
    assert(math.abs(rc.getAs[Double]("gap") - 4.0) < 1e-9)
    assert(math.abs(rc.getAs[Double]("explained") - 4.0) < 1e-9)
    assert(math.abs(rc.getAs[Double]("unexplained")) < 1e-9)
    assert(math.abs(rc.getAs[Double]("pct_explained") - 1.0) < 1e-9)
    // SAME x in both groups, level shift only: all structural
    val struct = Seq(("a", 15L, 1.0), ("a", 17L, 2.0), ("a", 19L, 3.0),
      ("b", 10L, 1.0), ("b", 12L, 2.0), ("b", 14L, 3.0))
    val rs = StatTests.oaxacaBlinder(struct.toDF("g", "y", "x"), "g",
      "a", "b", "y", "x").collect().head
    assert(math.abs(rs.getAs[Double]("gap") - 5.0) < 1e-9)
    assert(math.abs(rs.getAs[Double]("explained")) < 1e-9)
    assert(math.abs(rs.getAs[Double]("unexplained") - 5.0) < 1e-9)
    // degenerate group (constant x) -> NULL decomposition, means kept
    val deg = Seq(("a", 10L, 1.0), ("a", 12L, 1.0), ("a", 14L, 1.0),
      ("b", 10L, 0.0), ("b", 12L, 1.0), ("b", 14L, 2.0))
    val rd = StatTests.oaxacaBlinder(deg.toDF("g", "y", "x"), "g",
      "a", "b", "y", "x").collect().head
    assert(rd.isNullAt(rd.fieldIndex("explained")))
    assert(math.abs(rd.getAs[Double]("gap")) < 1e-9)
  }

  test("eValueRR: VanderWeele-Ding transform at point and CI bound") {
    // 30% vs 10% on 100/arm: RR 3, E = 3 + sqrt(6)
    val d = (1 to 100).flatMap(i => Seq(
      (1L, if (i <= 30) 1L else 0L), (0L, if (i <= 10) 1L else 0L)))
    val r = StatTests.eValueRR(d.toDF("t", "y"), "t", "y")
      .collect().head
    assert(math.abs(r.getAs[Double]("rr") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_value") -
      (3.0 + math.sqrt(6.0))) < 1e-12)
    // CI excludes 1 here: e_value_ci = E(lo) with lo > 1
    val seLn = math.sqrt(1.0 / 30 - 1.0 / 100 + 1.0 / 10 - 1.0 / 100)
    val lo = math.exp(math.log(3.0) - 1.959963985 * seLn)
    assert(lo > 1.0)
    assert(math.abs(r.getAs[Double]("e_value_ci") -
      (lo + math.sqrt(lo * (lo - 1.0)))) < 1e-12)
    // protective exposure: RR < 1 transforms through 1/RR — the E-value
    // is symmetric under swapping the arms
    val p = d.map { case (t, y) => (1L - t, y) }
    val rp = StatTests.eValueRR(p.toDF("t", "y"), "t", "y")
      .collect().head
    assert(math.abs(rp.getAs[Double]("rr") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(rp.getAs[Double]("e_value") -
      r.getAs[Double]("e_value")) < 1e-12)
    // identical arms: RR 1, both E-values 1
    val eq = (1 to 50).flatMap(i => Seq((1L, i % 5L / 4L), (0L, i % 5L / 4L)))
    val re = StatTests.eValueRR(eq.toDF("t", "y"), "t", "y")
      .collect().head
    assert(re.getAs[Double]("e_value") == 1.0 &&
      re.getAs[Double]("e_value_ci") == 1.0)
    // degenerate cell -> NULL
    val z = StatTests.eValueRR(Seq((1L, 0L), (0L, 1L)).toDF("t", "y"),
      "t", "y").collect().head
    assert(z.isNullAt(z.fieldIndex("rr")))
  }

  test("pageTrend: monotone blocks max out L; null trend centers it") {
    // 10 users, 4 weeks, strictly increasing per-user activity: every
    // block ranks 1..4 in order, L = b * sum(j * j) = 10 * 30 = 300 —
    // the maximum possible
    val up = for { u <- 1 to 10; w <- 1 to 4 } yield (s"u$u", w.toLong, w.toLong)
    val ru = StatTests.pageTrend(up.toDF("it", "wk", "v"), "it", "wk", "v")
      .collect().head
    assert(ru.getAs[Long]("n_items") == 10L && ru.getAs[Long]("k") == 4L)
    assert(ru.getAs[Double]("l_stat") == 300.0)
    assert(ru.getAs[Double]("mean_l") == 10 * 4 * 25 / 4.0)
    assert(ru.getAs[Double]("z") > 0 && ru.getAs[Double]("p_value") < 0.01)
    // reversed trend: L minimal, z < 0, one-sided p near 1
    val down = up.map { case (u, w, _) => (u, w, 5L - w) }
    val rd = StatTests.pageTrend(down.toDF("it", "wk", "v"), "it", "wk", "v")
      .collect().head
    assert(rd.getAs[Double]("z") < 0 && rd.getAs[Double]("p_value") > 0.99)
    // all-tied blocks: every mid-rank is (k+1)/2, L = mean_l exactly
    val flat = for { u <- 1 to 6; w <- 1 to 4 } yield (s"u$u", w.toLong, 7L)
    val rf = StatTests.pageTrend(flat.toDF("it", "wk", "v"), "it", "wk", "v")
      .collect().head
    assert(rf.getAs[Double]("l_stat") == rf.getAs[Double]("mean_l"))
    // incomplete blocks drop: a user missing week 4 must not count
    val mixed = up ++ Seq(("ux", 1L, 9L), ("ux", 2L, 9L), ("ux", 3L, 9L))
    val rm = StatTests.pageTrend(mixed.toDF("it", "wk", "v"), "it", "wk", "v")
      .collect().head
    assert(rm.getAs[Long]("n_items") == 10L)
    // k < 3 -> NULL
    val two = for { u <- 1 to 5; w <- 1 to 2 } yield (s"u$u", w.toLong, w.toLong)
    val r2 = StatTests.pageTrend(two.toDF("it", "wk", "v"), "it", "wk", "v")
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("l_stat")))
  }

  test("newcombeDiffCI: Wilson bounds, boundary sanity, hand replay") {
    // 20/100 vs 30/100
    val d = (1 to 100).flatMap(i => Seq(
      (0L, if (i <= 20) 1L else 0L), (1L, if (i <= 30) 1L else 0L)))
    val r = StatTests.newcombeDiffCI(d.toDF("t", "y"), "t", "y")
      .collect().head
    val z = 1.959963985; val z2 = z * z
    def wilson(s: Double, n: Double) = {
      val p = s / n
      val c = (p + z2 / (2 * n)) / (1 + z2 / n)
      val h = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n)
      (p, c - h, c + h)
    }
    val (pa, la, ua) = wilson(20, 100); val (pb, lb, ub) = wilson(30, 100)
    assert(math.abs(r.getAs[Double]("wilson_lo_a") - la) < 1e-12)
    assert(math.abs(r.getAs[Double]("wilson_hi_b") - ub) < 1e-12)
    val lo = (pb - pa) - math.sqrt((pb - lb) * (pb - lb) + (ua - pa) * (ua - pa))
    val hi = (pb - pa) + math.sqrt((ub - pb) * (ub - pb) + (pa - la) * (pa - la))
    assert(math.abs(r.getAs[Double]("ci_lo") - lo) < 1e-12)
    assert(math.abs(r.getAs[Double]("ci_hi") - hi) < 1e-12)
    // the interval contains the point difference and has positive width
    assert(lo < 0.1 && hi > 0.1)
    // boundary rate 0%: Wald would collapse to zero width; Wilson lower
    // bound is 0-ish but the upper bound stays strictly positive
    val zero = (1 to 50).flatMap(i => Seq((0L, 0L),
      (1L, if (i <= 10) 1L else 0L)))
    val rz = StatTests.newcombeDiffCI(zero.toDF("t", "y"), "t", "y")
      .collect().head
    assert(rz.getAs[Double]("p_a") == 0.0)
    assert(rz.getAs[Double]("wilson_hi_a") > 0.0)
    assert(rz.getAs[Double]("ci_lo") < rz.getAs[Double]("delta"))
    // empty arm -> NULL
    val r0 = StatTests.newcombeDiffCI(Seq((1L, 1L)).toDF("t", "y"),
      "t", "y").collect().head
    assert(r0.isNullAt(r0.fieldIndex("p_a")))
  }

  test("weightedMeanSurvey: Hajek mean, linearized SE, guards") {
    // uniform weights reduce to the plain mean; linearized SE matches
    // the population-moment sd/sqrt-ish identity computed by hand
    val d = Seq((10L, 1.0), (20L, 1.0), (30L, 1.0), (40L, 1.0))
    val r = Sampling.weightedMeanSurvey(d.toDF("y", "w"), "y", "w")
      .collect().head
    assert(math.abs(r.getAs[Double]("wmean") - 25.0) < 1e-9)
    val sr = Seq(10.0, 20.0, 30.0, 40.0).map(y => (y - 25) * (y - 25)).sum
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(sr) / 4.0) < 1e-9)
    // upweighting the large values pulls the mean up
    val up = Seq((10L, 1.0), (20L, 1.0), (30L, 3.0), (40L, 3.0))
    val ru = Sampling.weightedMeanSurvey(up.toDF("y", "w"), "y", "w")
      .collect().head
    assert(ru.getAs[Double]("wmean") > 25.0)
    // hand Hajek: (10 + 20 + 90 + 120) / 8 = 30
    assert(math.abs(ru.getAs[Double]("wmean") - 30.0) < 1e-9)
    // CI brackets the estimate symmetrically
    assert(math.abs((ru.getAs[Double]("ci_hi") + ru.getAs[Double]("ci_lo"))
      / 2 - ru.getAs[Double]("wmean")) < 1e-9)
    // zero/negative weights drop; all-zero mass -> NULL
    val z = Sampling.weightedMeanSurvey(
      Seq((10L, 0.0), (20L, -1.0)).toDF("y", "w"), "y", "w")
      .collect().head
    assert(z.isNullAt(z.fieldIndex("wmean")))
  }

  test("demingRegression: exact line, symmetry, attenuation resistance") {
    // perfect y = 2x + 3: the orthogonal fit recovers it exactly
    val line = (1 to 10).map(i => (i.toLong, 2L * i + 3))
    val rl = StatTests.demingRegression(line.toDF("x", "y"), "x", "y")
      .collect().head
    assert(math.abs(rl.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(rl.getAs[Double]("intercept") - 3.0) < 1e-12)
    assert(math.abs(rl.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    // lambda = 1 orthogonal regression is symmetric: slope(y~x) =
    // 1/slope(x~y) — OLS famously is NOT
    val noisy = Seq((1L, 5L), (2L, 4L), (3L, 9L), (4L, 7L), (5L, 12L),
      (6L, 10L), (7L, 16L), (8L, 13L))
    val fwd = StatTests.demingRegression(noisy.toDF("x", "y"), "x", "y")
      .collect().head.getAs[Double]("slope")
    val bwd = StatTests.demingRegression(noisy.toDF("x", "y"), "y", "x")
      .collect().head.getAs[Double]("slope")
    assert(math.abs(fwd - 1.0 / bwd) < 1e-9, s"$fwd vs 1/$bwd")
    // and it sits ABOVE the attenuated OLS slope for noisy-x data
    val n = noisy.size.toDouble
    val sx = noisy.map(_._1).sum.toDouble; val sy = noisy.map(_._2).sum.toDouble
    val cxx = noisy.map(d => d._1 * d._1).sum - sx * sx / n
    val cxy = noisy.map(d => d._1 * d._2).sum - sx * sy / n
    assert(fwd > cxy / cxx)
    // independent x/y (cxy = 0): NULL slope
    val ind = Seq((1L, 1L), (1L, -1L), (-1L, 1L), (-1L, -1L))
    val ri = StatTests.demingRegression(ind.toDF("x", "y"), "x", "y")
      .collect().head
    assert(ri.isNullAt(ri.fieldIndex("slope")))
  }

  test("methodAgreement: CCC penalizes shift and scale; Bland-Altman") {
    // identical measurements: perfect agreement on every axis
    val same = (1 to 10).map(i => (i.toLong, i.toLong))
    val rs = StatTests.methodAgreement(same.toDF("x", "y"), "x", "y")
      .collect().head
    assert(math.abs(rs.getAs[Double]("ccc") - 1.0) < 1e-12)
    assert(math.abs(rs.getAs[Double]("bias")) < 1e-12)
    assert(math.abs(rs.getAs[Double]("loa_lo")) < 1e-12 &&
      math.abs(rs.getAs[Double]("loa_hi")) < 1e-12)
    // constant shift y = x + 5: Pearson forgives (r = 1), CCC does not;
    // the differences are constant, so the limits collapse onto the bias
    val shift = (1 to 10).map(i => (i.toLong, i + 5L))
    val rh = StatTests.methodAgreement(shift.toDF("x", "y"), "x", "y")
      .collect().head
    assert(math.abs(rh.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    val vx = (1 to 10).map(i => i * i).sum / 10.0 - 5.5 * 5.5
    val cccExp = 2.0 * vx / (2.0 * vx + 25.0)
    assert(math.abs(rh.getAs[Double]("ccc") - cccExp) < 1e-12)
    assert(math.abs(rh.getAs[Double]("bias") - 5.0) < 1e-12)
    assert(math.abs(rh.getAs[Double]("loa_lo") - 5.0) < 1e-12)
    // scale disagreement y = 2x: r stays 1, CCC drops below 1, and the
    // limits of agreement widen around the mean bias
    val scale = (1 to 10).map(i => (i.toLong, 2L * i))
    val rc = StatTests.methodAgreement(scale.toDF("x", "y"), "x", "y")
      .collect().head
    assert(math.abs(rc.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(rc.getAs[Double]("ccc") < 1.0)
    assert(rc.getAs[Double]("loa_hi") - rc.getAs[Double]("loa_lo") > 1.0)
    // n < 2 -> NULL everything
    val r0 = StatTests.methodAgreement(Seq((1L, 1L)).toDF("x", "y"),
      "x", "y").collect().head
    assert(r0.isNullAt(r0.fieldIndex("ccc")))
  }

  test("groupSequentialObf: cumulative z per look, OBF boundary shape") {
    // 5 looks, 100 users per look per arm; treated converts at 30% vs
    // control 10% -> z grows with information, boundary shrinks
    val data = (1 to 5).flatMap { k =>
      (1 to 100).flatMap { i =>
        Seq((k.toLong, 0L, if (i <= 10) 1L else 0L),
          (k.toLong, 1L, if (i <= 30) 1L else 0L))
      }
    }
    val out = StatTests.groupSequentialObf(data.toDF("look", "t", "y"),
      "look", "t", "y").collect().sortBy(_.getLong(0))
    assert(out.length == 5)
    // cumulative counts accumulate exactly
    assert(out(4).getAs[Long]("n_a") == 500L &&
      out(4).getAs[Long]("x_b") == 150L)
    // boundary at look k is 2.0401*sqrt(5/k): strictly decreasing to
    // the published final critical value
    (0 until 4).foreach(i => assert(out(i).getAs[Double]("boundary") >
      out(i + 1).getAs[Double]("boundary")))
    assert(math.abs(out(4).getAs[Double]("boundary") - 2.0401) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("boundary") -
      2.0401 * math.sqrt(5.0)) < 1e-12)
    // hand z at look 2: pooled over 200/arm
    val (cx, tx) = (20.0, 60.0)
    val pp = (cx + tx) / 400
    val z2 = (tx / 200 - cx / 200) /
      math.sqrt(pp * (1 - pp) * (2.0 / 200))
    assert(math.abs(out(1).getAs[Double]("z") - z2) < 1e-9)
    // a 20-point lift crosses by the final look
    assert(out(4).getAs[Boolean]("crossed"))
    // degenerate look (no conversions anywhere yet) -> NULL z, not crossed
    val cold = Seq((1L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 1L), (2L, 1L, 1L))
    val oc = StatTests.groupSequentialObf(cold.toDF("look", "t", "y"),
      "look", "t", "y").collect().sortBy(_.getLong(0))
    assert(oc.head.isNullAt(oc.head.fieldIndex("z")) &&
      !oc.head.getAs[Boolean]("crossed"))
  }
}

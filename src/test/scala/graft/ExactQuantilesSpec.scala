package graft

import org.apache.spark.sql.functions._

import graft.profile.ExactQuantiles

/** The histogram-guided exact quantile pass must agree bit-for-bit with
  * Spark's `percentile` aggregate (the oracle-pinned semantics) on
  * NaN-free data, across duplicates, nulls, constants and forced
  * refinement. */
class ExactQuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  private val PS = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  private def sparkPercentile(df: org.apache.spark.sql.DataFrame,
      c: String): Seq[Double] =
    df.agg(percentile(col(c).cast("double"), lit(PS.toArray)))
      .head().getSeq[Double](0).toSeq

  test("agrees with the percentile aggregate on seeded random data") {
    val rnd = new scala.util.Random(42)
    // heavy duplication + a wide tail, plus nulls
    val vals = Seq.tabulate(20000) { i =>
      if (i % 17 == 0) None
      else if (i % 3 == 0) Some((rnd.nextInt(50)).toDouble)
      else Some(rnd.nextDouble() * 1e6 - 5e5)
    }
    val df = vals.toDF("v")
    val got = ExactQuantiles.quantiles(df, Seq("v"), PS)("v").map(_.get)
    assert(got == sparkPercentile(df, "v"))
  }

  test("forced refinement (tiny capRows) still lands exact values") {
    val rnd = new scala.util.Random(7)
    // all mass inside one narrow range so first-level bins are hot
    val df = Seq.fill(5000)(1000.0 + rnd.nextDouble() * 1e-3).toDF("v")
    val got = ExactQuantiles.quantiles(df, Seq("v"), PS,
      bins = 8, capRows = 100L)("v").map(_.get)
    assert(got == sparkPercentile(df, "v"))
  }

  test("unsplittable heavy value resolves without refinement loops") {
    // one double duplicated beyond capRows: range can't subdivide, the
    // distinct-collect path must resolve it directly
    val df = (Seq.fill(3000)(5.0) ++ Seq(1.0, 9.0)).toDF("v")
    val got = ExactQuantiles.quantiles(df, Seq("v"), PS,
      bins = 4, capRows = 10L)("v").map(_.get)
    assert(got == sparkPercentile(df, "v"))
  }

  test("agreement with percentile across seeded shapes and bin configs") {
    // distribution shapes that stress different paths: near-constant with
    // outliers (unsplittable-heavy), bimodal far modes (empty mid-bins),
    // exponential-ish tail (hot first bin), integer grid (exact ties)
    val shapes: Seq[(String, Int => Double)] = Seq(
      ("spike", i => if (i % 100 == 0) i.toDouble else 7.0),
      ("bimodal", i => if (i % 2 == 0) -1e6 + i else 1e6 - i),
      ("tail", i => math.pow(1.001, i % 5000)),
      ("grid", i => (i % 37).toDouble))
    for ((name, gen) <- shapes; bins <- Seq(4, 64); cap <- Seq(50L, 100000L)) {
      val df = Seq.tabulate(8000)(gen).toDF("v")
      val got = ExactQuantiles.quantiles(df, Seq("v"), PS,
        bins = bins, capRows = cap)("v").map(_.get)
      assert(got == sparkPercentile(df, "v"),
        s"shape=$name bins=$bins cap=$cap mismatch")
    }
  }

  test("multi-column batch matches per-column runs") {
    val rnd = new scala.util.Random(3)
    val df = Seq.tabulate(5000)(i =>
      (rnd.nextDouble() * 100, rnd.nextInt(1000).toLong)).toDF("a", "b")
    val batch = ExactQuantiles.quantiles(df, Seq("a", "b"), PS)
    assert(batch("a").map(_.get) == sparkPercentile(df, "a"))
    assert(batch("b").map(_.get) == sparkPercentile(df, "b"))
  }

  test("winsorize and quantileBins survive an all-null column gracefully") {
    val df = Seq[(Option[Double], Double)]((None, 1.0), (None, 2.0))
      .toDF("dead", "live")
    // dead column passes through unclipped; live column still clips
    val w = graft.profile.ColumnProfiler.winsorize(df, Seq("dead", "live"),
      lower = 0.25, upper = 0.75)
    assert(w.count() == 2 && w.columns.toSeq == Seq("dead", "live"))
    val qb = graft.profile.ColumnProfiler.quantileBins(df, "dead", k = 4)
    assert(qb.select("dead_bucket").collect().forall(_.isNullAt(0)))
  }

  test("edges: empty, all-null, constant, single row") {
    assert(ExactQuantiles.quantiles(
      Seq.empty[Double].toDF("v"), Seq("v"), PS)("v").forall(_.isEmpty))
    assert(ExactQuantiles.quantiles(
      Seq[Option[Double]](None, None).toDF("v"), Seq("v"), PS)("v")
      .forall(_.isEmpty))
    assert(ExactQuantiles.quantiles(
      Seq(3.5, 3.5, 3.5).toDF("v"), Seq("v"), PS)("v")
      .forall(_.contains(3.5)))
    assert(ExactQuantiles.quantiles(
      Seq(42.0).toDF("v"), Seq("v"), PS)("v").forall(_.contains(42.0)))
  }

  test("±Infinity inputs resolve extreme ranks without a full distinct-collect") {
    val rnd = new scala.util.Random(11)
    // 5% −∞, 5% +∞, the rest finite — with forced refinement so the bin
    // machinery actually runs on the finite range
    val vals = Seq.tabulate(5000) { i =>
      if (i % 20 == 0) Double.NegativeInfinity
      else if (i % 20 == 1) Double.PositiveInfinity
      else rnd.nextDouble() * 1000
    }
    val df = vals.toDF("v")
    val got = ExactQuantiles.quantiles(df, Seq("v"), PS,
      capRows = 500, smallRows = 100)("v").map(_.get)
    val want = sparkPercentile(df, "v")
    // compare with NaN-tolerant equality (mixed ∓∞ interpolation → NaN)
    assert(got.length == want.length &&
      got.zip(want).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) },
      s"got $got want $want")
    // p0 must be −∞ and p100 +∞ by construction
    assert(got.head == Double.NegativeInfinity && got.last == Double.PositiveInfinity)
  }

  test("all-infinite and infinity-heavy columns keep the percentile contract") {
    val inf = Seq(Double.NegativeInfinity, Double.PositiveInfinity,
      Double.PositiveInfinity).toDF("v")
    val got = ExactQuantiles.quantiles(inf, Seq("v"), Seq(0.0, 0.5, 1.0))("v")
    val want = inf.agg(percentile(col("v"), lit(Array(0.0, 0.5, 1.0))))
      .head().getSeq[Double](0)
    assert(got.map(_.get).zip(want).forall { case (a, b) =>
      a == b || (a.isNaN && b.isNaN) })
    // one −∞ among constants: p0 = −∞, upper ranks = the constant
    val mix = (Double.NegativeInfinity +: Seq.fill(99)(5.0)).toDF("v")
    val gm = ExactQuantiles.quantiles(mix, Seq("v"), Seq(0.0, 0.5, 1.0))("v")
    assert(gm == Seq(Some(Double.NegativeInfinity), Some(5.0), Some(5.0)))
  }

  test("overflowing span (values near ±MaxValue) bisects instead of collecting") {
    // hi − lo = ∞ though both bounds are finite: the fixed-width grid is
    // degenerate and the midpoint-bisection path must engage
    val vals = Seq(-1.7e308, -1.0e308, -42.0, 0.0, 7.0, 1.0e308, 1.7e308) ++
      Seq.tabulate(2000)(i => (i - 1000) * 1e300)
    val df = vals.toDF("v")
    val got = ExactQuantiles.quantiles(df, Seq("v"), PS,
      capRows = 100, smallRows = 50)("v").map(_.get)
    assert(got == sparkPercentile(df, "v"))
  }
}

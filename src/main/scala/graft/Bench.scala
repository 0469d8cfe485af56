package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced through the `noop` sink (full computation of every
  * column, no output cost) rather than `count()`, which would let Catalyst
  * prune the projections away and under-measure. One warm-up query runs
  * first so JIT/classloading costs don't land on the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // whole-suite warm pass (JIT, codegen cache, FS metadata) — not measured.
    // Warming only one query left later queries absorbing JIT cost in the
    // driver's n=1-style runs (round 1: q24 clocked 11.9s for a plan
    // equivalent to q08's 1.07s).
    // Optional args narrow the run to matching query prefixes ("q89 q116")
    // for local iteration; the driver passes none and gets the full suite.
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (args.isEmpty) all
      else all.filter(n => args.exists(a => n == a || n.startsWith(a + "_")))
    names.foreach { n => run(n); spark.catalog.clearCache() }

    // min of two runs per query: the host shows multi-second noise spikes
    // (same code measured 50s/118s/69s total across runs), and min-of-N is
    // the standard steady-state estimator under one-sided noise. A failure
    // in either run reports -1 — a 50%-flaky query must not hide behind its
    // surviving run's time.
    // clearCache after each query: the LSH operators persist kernel bases
    // (caller-unpersist contract); across 3 passes x 34 queries those blocks
    // accumulate and the resulting memory pressure lands on unrelated later
    // queries (BENCH_r02: q05, a plain broadcast join, clocked 11.7s under
    // the driver where an isolated run takes 1.5s).
    val results = names.map { n =>
      val a = run(n)
      val b = run(n)
      spark.catalog.clearCache()
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // Keep the line SHORT: the driver reads a bounded tail of the captured
    // output, and r3's 68-query line with full names + 15-digit doubles
    // overflowed it (the head of the line — total and q01..q03 — was cut).
    // Short keys ("q27" not "q27_lang_quality") and 3-decimal seconds keep
    // the whole line comfortably inside the window.
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

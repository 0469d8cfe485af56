package graft

import org.apache.spark.sql.functions._
import graft.functions.kernels.LayoutKernelFunctions
import graft.ops.LayoutOps

class LayoutOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("interleaveBits places bit b of dim c at position b*n+c") {
    // x=0b10, y=0b11, 2 bits: bit0 -> x0=0@0, y0=1@1; bit1 -> x1=1@2, y1=1@3
    val z = Seq((2, 3)).toDF("x", "y")
      .select(LayoutKernelFunctions.interleaveBits(array($"x", $"y"), 2))
      .as[Long].head()
    assert(z == 14L) // 0b1110
    // single dimension degenerates to identity
    val id = Seq(5).toDF("x")
      .select(LayoutKernelFunctions.interleaveBits(array($"x"), 8))
      .as[Long].head()
    assert(id == 5L)
  }

  test("zValue clamps out-of-range and null inputs to edge buckets") {
    val df = Seq((Some(-10.0), 0.0), (Some(999.0), 0.0), (None, 0.0))
      .toDF("a", "b")
    val z = df.select(LayoutOps.zValue(
      Seq(col("a") -> (0.0, 100.0), col("b") -> (0.0, 100.0)), bits = 4))
      .as[Long].collect()
    assert(z(0) >= 0L)             // clamped low, not negative
    assert(z.forall(_ < (1L << 8))) // 2 dims x 4 bits
  }

  test("writeZOrdered gives every file locality in BOTH dimensions") {
    // 64x64 uniform grid; a single-column sort gives per-file y-span ~ full
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).cast("double").as("x"),
      (col("id") / 64).cast("double").as("y"))
    val dir = tmpDir("zorder")
    LayoutOps.writeZOrdered(grid, Seq("x", "y"), s"$dir/z", numFiles = 4, bits = 8)

    def meanSpans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
        (r.getDouble(0), r.getDouble(1))
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zx, zy) = meanSpans(s"$dir/z")
    // z-order: 4 files ≈ quadrant halves — both dims well under full span
    assert(zx <= 0.8 * 63 && zy <= 0.8 * 63, s"z-order spans too wide: $zx, $zy")

    // contrast: x-sorted layout keeps y unclustered (span ~ full range)
    grid.repartitionByRange(4, $"x").sortWithinPartitions($"x")
      .write.parquet(s"$dir/xsort")
    val (_, sy) = meanSpans(s"$dir/xsort")
    assert(sy > 0.9 * 63, s"x-sorted control should have full y span, got $sy")
    // and the z-ordered data is still exactly the same rows
    val back = spark.read.parquet(s"$dir/z")
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
  }

  test("compact merges small files without a shuffle; data identical") {
    val df = spark.read.parquet(sf("orders"))
    val dir = tmpDir("compact")
    df.repartition(20).write.parquet(s"$dir/small")
    val nSmall = new java.io.File(s"$dir/small").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nSmall == 20)

    val n = LayoutOps.compact(spark, s"$dir/small", s"$dir/big",
      targetBytes = 512L * 1024 * 1024)
    assert(n == 1) // inputs are far below one target file
    val nBig = new java.io.File(s"$dir/big").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nBig == 1)
    val back = spark.read.parquet(s"$dir/big")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("compact sizes partitioned (nested-dir) datasets from the leaf files") {
    val df = spark.read.parquet(sf("orders"))
      .withColumn("pt", col("o_orderkey") % 4)
    val dir = tmpDir("compact-part")
    df.repartition(8).write.partitionBy("pt").parquet(s"$dir/small")
    // a non-recursive listing sees only the pt=... subdirectories (~0
    // bytes) and would collapse everything to one file regardless of
    // target; the recursive sum must produce > 1 output file here
    val total = {
      def walk(f: java.io.File): Long =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) f.length else 0L)
        else f.listFiles().map(walk).sum
      walk(new java.io.File(s"$dir/small"))
    }
    val target = total / 4
    val n = LayoutOps.compact(spark, s"$dir/small", s"$dir/big", targetBytes = target)
    assert(n >= 4, s"expected >= 4 output files from the recursive byte sum, got $n")
    val back = spark.read.parquet(s"$dir/big")
    assert(back.count() == df.count())
    // and an empty directory fails fast instead of rewriting nothing
    new java.io.File(s"$dir/empty").mkdirs()
    intercept[IllegalArgumentException] {
      LayoutOps.compact(spark, s"$dir/empty", s"$dir/none")
    }
  }

  test("interleaveBits rejects wrap-around misuse instead of corrupting keys") {
    import graft.functions.kernels.LayoutKernelFunctions
    // constant folding may evaluate on the driver (IllegalArgumentException
    // direct) or at execution (wrapped in SparkException) — accept either
    def failsWith(df: org.apache.spark.sql.DataFrame, fragment: String): Unit = {
      val e = intercept[Exception] { df.collect() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains(fragment), s"unexpected failure: $msgs")
    }
    // 3 dims x 31 bits = 93 > 63: would silently wrap via mod-64 shifts
    failsWith(Seq((1, 2, 3)).toDF("a", "b", "c")
      .select(LayoutKernelFunctions.interleaveBits(array($"a", $"b", $"c"), 31)),
      "exceeds a long")
    // negative dimension: sign bit would smear across the z-value
    failsWith(Seq((-1, 2)).toDF("a", "b")
      .select(LayoutKernelFunctions.interleaveBits(array($"a", $"b"), 16)),
      "negative or exceeds")
    // value wider than `bits`
    failsWith(Seq((70000, 2)).toDF("a", "b")
      .select(LayoutKernelFunctions.interleaveBits(array($"a", $"b"), 16)),
      "negative or exceeds")
  }

  test("zValue projection plan has no exchange") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = docs.select(LayoutOps.zValue(
        Seq(col("doc_id") -> (0.0, 1000.0), col("n_chars") -> (0.0, 500.0))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"z-value must be a pure projection:\n$plan")
  }
}

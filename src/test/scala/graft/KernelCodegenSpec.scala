package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.kernels.TextKernels
import graft.functions.kernels.TextKernelFunctions._

/** The array-returning text kernels generate code (doGenCode) instead of
  * CodegenFallback. This spec drives them in a session where expression
  * codegen may NOT fall back to interpreted eval — a Janino error in the
  * generated fragments fails loudly here instead of silently degrading
  * every kernel projection in production. Results are cross-checked
  * against direct kernel calls (the eval path's ground truth), so codegen
  * and eval can never drift apart. */
class KernelCodegenSpec extends SparkSpecBase {

  test("generated kernel code compiles and matches the eval path exactly") {
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    strict.conf.set("spark.sql.codegen.fallback", "false")
    import strict.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",
      "",
      "repeat repeat repeat repeat",
      "a b c d e f g")
    val out = texts.toDF("t").select(
      shingleHashes(col("t"), 3).as("sh"),
      shingleHashSet(col("t"), 3).as("shs"),
      shingleStrings(col("t"), 2, 2).as("ss"),
      tokenChunks(col("t"), 3, 2).as("tc"),
      minhashSignature(shingleHashSet(col("t"), 3), 8).as("mh"),
      minShingleMd5(col("t"), 3).as("m5"),
      charShingleHashSet(col("t"), 4).as("cs"),
      charNgrams(col("t"), 3).as("cn")
    ).collect()
    texts.zip(out).foreach { case (t, r) =>
      val u = UTF8String.fromString(t)
      assert(r.getSeq[Long](0) == TextKernels.shingleHashes(u, 3).toSeq, s"sh: $t")
      assert(r.getSeq[Long](1) == TextKernels.shingleHashSet(u, 3).toSeq, s"shs: $t")
      assert(r.getSeq[String](2) ==
        TextKernels.shingleStrings(u, 2, 2).map(_.toString).toSeq, s"ss: $t")
      assert(r.getSeq[String](3) ==
        TextKernels.tokenChunks(u, 3, 2).map(_.toString).toSeq, s"tc: $t")
      assert(r.getSeq[Long](4) ==
        TextKernels.minhash(TextKernels.shingleHashSet(u, 3), 8).toSeq, s"mh: $t")
      val m5 = Option(TextKernels.minShingleMd5(u, 3)).map(_.toString).orNull
      assert((if (r.isNullAt(5)) null else r.getString(5)) == m5, s"m5: $t")
      assert(r.getSeq[Long](6) == TextKernels.charShingleHashSet(u, 4).toSeq, s"cs: $t")
      assert(r.getSeq[String](7) ==
        TextKernels.charNgrams(u, 3).map(_.toString).toSeq, s"cn: $t")
    }
  }

  test("RangeBucketExpr codegen matches eval across directions, null and NaN") {
    val strict = spark.newSession()
    strict.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    strict.conf.set("spark.sql.codegen.fallback", "false")
    import strict.implicits._
    val splits = Array(-10.0, 0.0, 1.5, 99.0)
    val vals = Seq(Some(-50.0), Some(-10.0), Some(-0.1), Some(0.0), Some(1.0),
      Some(1.5), Some(50.0), Some(99.0), Some(1e12), None, Some(Double.NaN))
    for (desc <- Seq(false, true); nf <- Seq(true, false)) {
      val got = vals.toDF("v")
        .select(graft.ops.ScaleOps.rangeBucketExpr(splits, col("v"), desc, nf)
          .as("b")).collect().map(_.getInt(0)).toSeq
      // eval-path ground truth via the expression's own eval
      val want = vals.map { ov =>
        val expr = graft.functions.kernels.RangeBucketExpr(
          org.apache.spark.sql.catalyst.expressions.Literal(ov.orNull,
            org.apache.spark.sql.types.DoubleType), splits, desc, nf)
        expr.eval(null).asInstanceOf[Int]
      }
      assert(got == want, s"desc=$desc nullsFirst=$nf: $got vs $want")
      // monotone over the non-null, non-NaN values in sort direction
      val clean = vals.flatten.filterNot(_.isNaN).sorted
      val ordered = if (desc) clean.reverse else clean
      val bs = ordered.map(v => graft.functions.kernels.RangeBucketKernel
        .countLe(splits, v)).map(c => if (desc) splits.length - c else c)
      assert(bs == bs.sorted, s"bucket ids must be monotone: $bs")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{CompareOps, IndexOps}
import graft.operators.Dedup
import graft.sources.EventsSource

/** Regressions for review findings: nanos precision, null-safe comparisons,
  * pigeonhole contract, empty-set banding. */
class RegressionSpec extends SparkSpecBase {
  import spark.implicits._

  test("events nanos→micros conversion is exact (no double-division drift)") {
    // exact-microsecond epoch-nanos above 2^53, where double division loses 1µs
    val dir = tmpDir("nanos") + "/events"
    Seq(1722470400000123000L, 1722470400000124000L, 1704067200999999000L)
      .toDF("ts").write.parquet(dir)
    val got = EventsSource.read(spark, dir)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq == Seq(1704067200999999L, 1722470400000123L, 1722470400000124L))
  }

  test("alignment validation treats equal NULL keys as aligned") {
    val a = Seq[(Option[Int], String)]((Some(1), "x"), (None, "y")).toDF("k", "v")
    val b = Seq[(Option[Int], Double)]((Some(1), 1.0), (None, 2.0)).toDF("k", "w")
    IndexOps.validateIndexAlignment(Seq(a, b), Seq("k")) // must not throw
    val c = Seq[(Option[Int], Double)]((Some(1), 1.0)).toDF("k", "w")
    assertThrows[IllegalArgumentException](
      IndexOps.validateIndexAlignment(Seq(a, c), Seq("k")))
  }

  test("diffCounts matches identical rows containing NULLs") {
    val a = Seq[(Option[Int], String)]((None, "x"), (Some(1), "y")).toDF("k", "v")
    val r = CompareOps.diffCounts(a, a).head()
    assert(r.getLong(0) == 0 && r.getLong(1) == 0 && r.getLong(2) == 2)
  }

  test("simhashPairs rejects maxHamming >= numChunks") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 4, numChunks = 4))
  }

  test("minhashLsh does not pair up shingle-less short docs") {
    val docs = Seq(
      (1L, "hi"), (2L, "yo"), (3L, "ok"), // all shorter than shingleSize
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 16, numBands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((4L, 5L))) // short docs generate no candidates at all
  }

  test("sign bits kernel raises a clear error on dim mismatch") {
    val df = Seq(Seq(1.0f, 2.0f)).toDF("v")
    val ex = intercept[Exception](
      df.select(graft.functions.kernels.VectorKernelFunctions.signBits($"v", 8, 4))
        .collect())
    assert(ex.getMessage != null)
  }

  test("repartitionForMedia survives empty input and uses ceil") {
    val empty = Seq.empty[(Long, Array[Byte])].toDF("id", "b")
    assert(graft.operators.Multimodal.repartitionForMedia(empty, "b").count() == 0)
    assertThrows[IllegalArgumentException](
      graft.operators.Multimodal.sampleFrames(empty, "b", 0))
  }
}

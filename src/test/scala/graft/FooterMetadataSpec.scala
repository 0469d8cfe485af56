package graft

import org.apache.spark.sql.functions._

import graft.frame.LazyParquetFrame
import graft.io.{FooterMetadata, ParquetIO}
import graft.ops.{ConcatOps, SchemaOps}

/** Footer KV write-back + pandas-metadata round-trip. Mirrors the reference
  * contracts in test/concat/test_wide.py:133-166, test_tall.py:141-172 and
  * lazy_parquet.py:88-122 index recovery. */
class FooterMetadataSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeSample(path: String): Unit =
    ParquetIO.writeSingleFile(
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "name", "v"), path)

  test("writeKeyValue round-trips table metadata and keeps data readable") {
    val p = s"${tmpDir("kv")}/t.parquet"
    writeSample(p)
    SchemaOps.writeTableMetadata(spark, p, Map("owner" -> "graft", "purpose" -> "spec"))
    val kv = SchemaOps.readTableMetadata(spark, p)
    assert(kv("owner") == "graft" && kv("purpose") == "spec")
    // data intact after footer rewrite, and Spark still gets its schema key
    val df = spark.read.parquet(p)
    assert(df.count() == 3 && df.columns.toSeq == Seq("id", "name", "v"))
    assert(FooterMetadata.readKeyValue(spark, p)
      .contains("org.apache.spark.sql.parquet.row.metadata"))
  }

  test("writeKeyValue merge semantics: merge keeps, replace drops non-engine keys") {
    val p = s"${tmpDir("kv")}/t.parquet"
    writeSample(p)
    SchemaOps.writeTableMetadata(spark, p, Map("a" -> "1", "b" -> "2"))
    SchemaOps.writeTableMetadata(spark, p, Map("b" -> "3"))
    assert(SchemaOps.readTableMetadata(spark, p) == Map("a" -> "1", "b" -> "3"))
    SchemaOps.writeTableMetadata(spark, p, Map("c" -> "4"), merge = false)
    assert(SchemaOps.readTableMetadata(spark, p) == Map("c" -> "4"))
    assert(spark.read.parquet(p).count() == 3) // engine schema key survived
  }

  test("writeKeyValue stamps every part file of a directory output") {
    val dir = s"${tmpDir("kv")}/t_dir"
    Seq.tabulate(100)(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(3).write.parquet(dir)
    FooterMetadata.writeKeyValue(spark, dir, Map("k" -> "v"))
    val files = ParquetIO.dataFiles(spark, dir)
    assert(files.size == 3)
    files.foreach { f =>
      assert(FooterMetadata.readKeyValue(spark, f.toString)("k") == "v")
    }
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("lazy frame recovers single index from pandas footer metadata") {
    val p = s"${tmpDir("pandas")}/t.parquet"
    writeSample(p)
    FooterMetadata.attachPandasMeta(spark, p, Seq("id"))
    val lp = LazyParquetFrame(spark, p) // no explicit index
    assert(lp.indexColumns == Seq("id"))
    assert(lp.info.exists { case (c, _, st) => c == "id" && st == "loaded" })
  }

  test("lazy frame recovers MultiIndex and round-trips it via toParquet") {
    val p = s"${tmpDir("pandas")}/t.parquet"
    writeSample(p)
    val lp = LazyParquetFrame(spark, p, Seq("id", "name"))
    val out = s"${tmpDir("pandas")}/out.parquet"
    lp.toParquet(out, singleFile = true)
    val reopened = LazyParquetFrame(spark, out)
    assert(reopened.indexColumns == Seq("id", "name"))
  }

  test("setIndex reassigns the index (MultiIndex assignment parity)") {
    val p = s"${tmpDir("pandas")}/t.parquet"
    writeSample(p)
    val lp = LazyParquetFrame(spark, p, Seq("id"))
    lp.setIndex(Seq("id", "name"))
    assert(lp.indexColumns == Seq("id", "name"))
    assertThrows[NoSuchElementException](lp.setIndex(Seq("nope")))
  }

  test("plain files without pandas metadata get an empty index") {
    val p = s"${tmpDir("pandas")}/t.parquet"
    writeSample(p)
    assert(LazyParquetFrame(spark, p).indexColumns.isEmpty)
  }

  test("tall concat merges and propagates pandas metadata (test_tall.py:141-172)") {
    val d = tmpDir("tall")
    val f1 = s"$d/f1.parquet"; val f2 = s"$d/f2.parquet"
    ParquetIO.writeSingleFile(Seq((1L, "A"), (2L, "B")).toDF("x", "a"), f1)
    ParquetIO.writeSingleFile(Seq((4L, "D"), (5L, "E")).toDF("x", "a"), f2)
    FooterMetadata.attachPandasMeta(spark, f1, Seq("x"))
    FooterMetadata.attachPandasMeta(spark, f2, Seq("x"))
    val out = s"$d/tall.parquet"
    ConcatOps.tallFiles(spark, Seq(f1, f2), out, singleFile = true)
    val meta = FooterMetadata.readPandasMeta(spark, out)
    assert(meta.isDefined, "missing pandas metadata in output")
    assert(meta.get.indexColumns == Seq("x"))
    assert(spark.read.parquet(out).count() == 4)
  }

  test("wide concat merges pandas metadata with column union (test_wide.py:133-166)") {
    val d = tmpDir("wide")
    val f1 = s"$d/f1.parquet"; val f2 = s"$d/f2.parquet"
    ParquetIO.writeSingleFile(Seq((1L, "A"), (2L, "B")).toDF("x", "a"), f1)
    ParquetIO.writeSingleFile(Seq((1L, 0.1), (2L, 0.2)).toDF("x", "b"), f2)
    FooterMetadata.attachPandasMeta(spark, f1, Seq("x"))
    FooterMetadata.attachPandasMeta(spark, f2, Seq("x"))
    val out = s"$d/wide.parquet"
    ConcatOps.wideFiles(spark, Seq(f1, f2), out, Seq("x"), singleFile = true)
    val meta = FooterMetadata.readPandasMeta(spark, out)
    assert(meta.isDefined)
    assert(meta.get.indexColumns == Seq("x"))
    assert(meta.get.columnNames.toSet == Set("x", "a", "b")) // union, first-seen
  }

  test("pandas metadata round-trips through MULTI-PART inputs and outputs") {
    // SURVEY §7.4(2) calls multi-part best-effort; the documented behavior
    // is: every part of a directory output gets the merged blob, the
    // directory-level read recovers it, and the lazy frame recovers the
    // index from the directory exactly as from a single file
    val d = tmpDir("multipart")
    val in1 = s"$d/in1"; val in2 = s"$d/in2"
    Seq.tabulate(50)(i => (i.toLong, s"a$i")).toDF("x", "a")
      .repartition(3).write.parquet(in1)
    Seq.tabulate(50)(i => (i.toLong, i * 0.5)).toDF("x", "b")
      .repartition(2).write.parquet(in2)
    FooterMetadata.attachPandasMeta(spark, in1, Seq("x"))
    FooterMetadata.attachPandasMeta(spark, in2, Seq("x"))
    // directory-level read sees the blob on multi-part INPUTS
    assert(FooterMetadata.readPandasMeta(spark, in1).exists(_.indexColumns == Seq("x")))
    val out = s"$d/out"
    spark.read.parquet(in1).join(spark.read.parquet(in2), "x")
      .repartition(4).write.parquet(out)
    FooterMetadata.propagatePandasMeta(spark, Seq(in1, in2), out)
    // every part of the multi-part OUTPUT carries the merged blob
    val parts = ParquetIO.dataFiles(spark, out)
    assert(parts.size == 4)
    parts.foreach { f =>
      val m = FooterMetadata.readPandasMeta(spark, f.toString)
      assert(m.isDefined, s"part $f lost the pandas blob")
      assert(m.get.indexColumns == Seq("x"))
      assert(m.get.columnNames.toSet == Set("x", "a", "b")) // first-seen union
    }
    // lazy frame index recovery works from the directory, not just a file
    val frame = LazyParquetFrame(spark, out)
    assert(frame.indexColumns == Seq("x"))
    assert(spark.read.parquet(out).count() == 50)
  }

  test("inputs without pandas metadata propagate nothing") {
    val d = tmpDir("none")
    val f1 = s"$d/f1.parquet"
    ParquetIO.writeSingleFile(Seq((1L, "A")).toDF("x", "a"), f1)
    val out = s"$d/out.parquet"
    ConcatOps.tallFiles(spark, Seq(f1), out, singleFile = true)
    assert(FooterMetadata.readPandasMeta(spark, out).isEmpty)
  }

  test("save() re-stamps pandas index so it survives in-place persistence") {
    val d = tmpDir("save")
    val p = s"$d/t.parquet"
    writeSample(p)
    val lp = LazyParquetFrame(spark, p, Seq("id"))
    lp.update("v2", col("v") * 2)
    lp.save()
    val reopened = LazyParquetFrame(spark, p)
    assert(reopened.indexColumns == Seq("id"))
    assert(reopened.columns.contains("v2"))
  }
}

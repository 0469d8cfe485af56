package graft

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.jdk.CollectionConverters._

import graft.io.{ArchiveUtils, FileHash, ParquetIO}
import graft.profile.{ColumnProfiler, ProfileComparison}
import graft.sources.DemoBlockModel

/** S4/S6/S7/C2/C4 + iterRowChunks coverage. */
class UtilitiesSpec extends SparkSpecBase {
  import spark.implicits._

  test("demo block model: grid coords, c/f order, depth (reference semantics)") {
    val df = DemoBlockModel.create(spark, shape = (3, 3, 3)).orderBy("c_order_xyz")
    assert(df.count() == 27)
    val rows = df.collect()
    // first block centered at (0.5, 0.5, 0.5); c-order varies z fastest
    assert(rows(0).getDouble(0) == 0.5 && rows(0).getDouble(1) == 0.5 && rows(0).getDouble(2) == 0.5)
    assert(rows(1).getDouble(2) == 1.5) // next z layer
    // f_order sorted by (z,y,x) must be 0..n-1
    val fSorted = df.orderBy("z", "y", "x").select("f_order_zyx").as[Long].collect()
    assert(fSorted.toSeq == (0L until 27L))
    // depth = surface − z; top layer depth = half block
    assert(df.filter($"z" === 2.5).head().getAs[Double]("depth") == 0.5)
  }

  test("parquet validity check: true for parquet, false for junk") {
    assert(ParquetIO.isValidParquet(spark, sf("region")))
    val junk = tmpDir("junk") + "/notparquet.parquet"
    Files.write(Paths.get(junk), "not a parquet file".getBytes)
    assert(!ParquetIO.isValidParquet(spark, junk))
  }

  test("readLake: schema evolution merges, corrupt file skipped, not failed") {
    val base = tmpDir("lake")
    Seq((1L, "en"), (2L, "fr")).toDF("doc_id", "lang")
      .write.parquet(s"$base/v1")
    Seq((3L, "en", 30L)).toDF("doc_id", "lang", "n_chars")
      .write.parquet(s"$base/v2")
    Files.write(Paths.get(s"$base/v2/part-junk.parquet"), Array.fill[Byte](96)(0x5a))
    val lake = ParquetIO.readLake(spark, s"$base/{v1,v2}")
    assert(lake.columns.toSet == Set("doc_id", "lang", "n_chars"))
    val rows = lake.orderBy("doc_id").collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("n_chars"))),
      "v1 rows must read the evolved column as NULL")
    assert(rows.last.getAs[Long]("n_chars") == 30L)
    // with tolerance off, the junk file fails the scan (the default-strict
    // behavior readLake deliberately relaxes)
    intercept[Exception] {
      ParquetIO.readLake(spark, s"$base/{v1,v2}", ignoreCorrupt = false)
        .count()
    }
  }

  test("file hash: fast, sha256, xxhash, custom digest, missing-src error") {
    val dir = tmpDir("hash")
    val a = s"$dir/a.bin"; val b = s"$dir/b.bin"; val c = s"$dir/c.bin"
    Files.write(Paths.get(a), Array.fill(100000)(7.toByte))
    Files.write(Paths.get(b), Array.fill(100000)(7.toByte))
    Files.write(Paths.get(c), Array.fill(100000)(8.toByte))
    for (m <- Seq("fast", "sha256", "xxhash")) {
      assert(FileHash.filesMatch(a, b, m), m)
      assert(!FileHash.filesMatch(a, c, m), m)
    }
    assert(!FileHash.filesMatch(a, s"$dir/nope.bin"))
    assertThrows[java.io.FileNotFoundException](FileHash.filesMatch(s"$dir/nope.bin", a))
    // custom digest strategy plug-in
    val sizeDigest: FileHash.Digest = in => Iterator.continually(in.read())
      .takeWhile(_ >= 0).size.toString
    assert(FileHash.filesMatch(a, c, sizeDigest)) // same size → same custom digest
  }

  test("archive extraction: zip in, files out, zip-slip rejected") {
    val dir = tmpDir("arc")
    val zipPath = s"$dir/data.zip"
    val z = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    z.putNextEntry(new ZipEntry("inner/file.txt"))
    z.write("hello".getBytes); z.closeEntry()
    z.putNextEntry(new ZipEntry("top.txt"))
    z.write("world".getBytes); z.closeEntry()
    z.close()
    val out = ArchiveUtils.extractArchive(zipPath, s"$dir/out")
    assert(out.size == 2)
    assert(new String(Files.readAllBytes(Paths.get(s"$dir/out/inner/file.txt"))) == "hello")
    val garbage = s"$dir/data.7z"
    Files.write(Paths.get(garbage), "fake".getBytes)
    // neither a zip nor a 7z: the 7z fallback rejects it
    assertThrows[java.io.IOException](
      ArchiveUtils.extractArchive(garbage, s"$dir/out2"))

    val evil = s"$dir/evil.zip"
    val ez = new ZipOutputStream(new java.io.FileOutputStream(evil))
    ez.putNextEntry(new ZipEntry("../escape.txt")); ez.write("x".getBytes)
    ez.closeEntry(); ez.close()
    assertThrows[SecurityException](ArchiveUtils.extractArchive(evil, s"$dir/out3"))
  }

  test("diff-only report prunes equal columns and renders with prefixes") {
    val a = ColumnProfiler.profile(Seq((1.0, "x")).toDF("same", "changed"))
    val b = ColumnProfiler.profile(Seq((1.0, "y")).toDF("same", "changed"))
    val s = ProfileComparison.compare(Seq(a, b), Seq("a", "b"))
    val pruned = ProfileComparison.diffOnly(s)
    assert(pruned.columns.keySet == Set("changed"))
    assert(pruned.overview.totalColumns == 1 && pruned.overview.equal == 0)
    val text = ProfileComparison.renderReport(s)
    assert(text.contains("🟢 same") && text.contains("🔴 changed"))
    assert(text.contains("abs_tol"))
    val diffText = ProfileComparison.renderReport(s, diffsOnly = true)
    assert(!diffText.contains("same ["))
  }

  test("lazy frame iterRowChunks streams fixed-size chunks") {
    val lp = graft.frame.LazyParquetFrame(spark, sf("customer"))
    val chunks = lp.iterRowChunks(chunkSize = 60).toSeq
    assert(chunks.map(_.size).sum == 150)
    assert(chunks.forall(_.size <= 60))
    val cols = lp.iterRowChunks(50, Some(Seq("c_custkey"))).next()
    assert(cols.head.schema.fieldNames.toSeq == Seq("c_custkey"))
  }

  test("archive extraction: 7z fallback via commons-compress") {
    import org.apache.commons.compress.archivers.sevenz.{SevenZOutputFile, SevenZArchiveEntry}
    val dir = java.nio.file.Files.createTempDirectory("sevenz")
    val arc = dir.resolve("a.7z").toFile
    val out = new SevenZOutputFile(arc)
    try {
      val e = out.createArchiveEntry(dir.toFile, "nested/hello.txt")
      out.putArchiveEntry(e)
      out.write("seven zip payload".getBytes("UTF-8"))
      out.closeArchiveEntry()
    } finally out.close()
    val outDir = dir.resolve("out").toString
    val extracted = graft.io.ArchiveUtils.extractArchive(arc.toString, outDir)
    assert(extracted.size == 1)
    val text = new String(java.nio.file.Files.readAllBytes(extracted.head), "UTF-8")
    assert(text == "seven zip payload")
  }

  test("rowGroupStats: footer min/max/count per row group, predicate skip verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("rgstats")
    // small row groups force multiple groups in one file
    (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .coalesce(1).sort("id")
      .write.option("parquet.block.size", "4096").mode("overwrite")
      .parquet(s"$dir/t")
    val out = graft.io.ParquetIO.rowGroupStats(spark, s"$dir/t", Seq("v"),
      predicate = Some(("v", 1.0, 5.0)))
    val rows = out.orderBy(col("row_group")).collect().map(r =>
      (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.length > 1, "expected multiple row groups")
    assert(rows.map(_._2).sum == 1000L)
    // row groups are sorted by id (= v): only the first can match [1, 5]
    assert(!rows.head._5 && rows.tail.forall(_._5))
    assert(rows.head._3 == 1.0 && rows.last._4 == 1000.0)
    // non-overlapping, covering ranges
    rows.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3) case _ => }
  }

  test("rowGroupStats rejects non-numeric columns with a clear error") {
    import spark.implicits._
    val dir = tmpDir("rgstats2")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(s"$dir/t")
    val e = intercept[IllegalArgumentException] {
      graft.io.ParquetIO.rowGroupStats(spark, s"$dir/t", Seq("s")).collect()
    }
    assert(e.getMessage.contains("not numeric"))
  }

  test("writePartitioned: dynamic overwrite swaps only the written partition") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft_powrite")
    val lake = s"$dir/lake"
    val full = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
      .toDF("id", "k", "v")
    ParquetIO.writePartitioned(full, lake, Seq("k"))
    def files(part: String): Map[String, String] =
      new java.io.File(s"$lake/k=$part").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> FileHash.digest(f.toPath, FileHash.sha256)).toMap
    val bBefore = files("b"); val cBefore = files("c")
    ParquetIO.writePartitioned(
      Seq((9L, "a", 9.0)).toDF("id", "k", "v"), lake, Seq("k"))
    assert(files("b") == bBefore && files("c") == cBefore,
      "untouched partitions must stay byte-identical")
    val back = spark.read.parquet(lake)
    assert(back.filter(col("k") === "a").select("id").collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(back.count() == 3)
  }

  test("writePartitioned: static overwrite truncates the whole table path") {
    val dir = tmpDir("graft_postatic")
    val lake = s"$dir/lake"
    val full = Seq((1L, "a", 1.0), (3L, "b", 3.0)).toDF("id", "k", "v")
    ParquetIO.writePartitioned(full, lake, Seq("k"))
    ParquetIO.writePartitioned(
      Seq((9L, "a", 9.0)).toDF("id", "k", "v"), lake, Seq("k"), dynamic = false)
    val parts = new java.io.File(lake).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("k=")).map(_.getName).toSet
    assert(parts == Set("k=a"), s"static overwrite must drop other partitions: $parts")
  }

  test("atomicFileCopy: copy, verify, dir target, identical-skip, force") {
    import graft.io.AtomicFiles
    val dir = Paths.get(tmpDir("atomic_copy"))
    val src = dir.resolve("src.bin")
    Files.write(src, Array.tabulate[Byte](1 << 16)(i => (i * 31).toByte))
    // plain copy: content identical, sha256 verified inside the call
    val dst = AtomicFiles.atomicFileCopy(src, dir.resolve("dst.bin"))
    assert(FileHash.filesMatch(src.toString, dst.toString, "sha256"))
    // directory target appends the source file name
    val sub = Files.createDirectory(dir.resolve("sub"))
    assert(AtomicFiles.atomicFileCopy(src, sub).getFileName.toString == "src.bin")
    // identical-dest short-circuit keeps the existing file (same mtime)
    val before = Files.getLastModifiedTime(dst)
    AtomicFiles.atomicFileCopy(src, dst)
    assert(Files.getLastModifiedTime(dst) == before)
    // force re-copies even when identical
    AtomicFiles.atomicFileCopy(src, dst, force = true)
    assert(FileHash.filesMatch(src.toString, dst.toString, "sha256"))
    // no temp droppings anywhere
    assert(!Files.list(dir).iterator().asScala.exists(_.toString.endsWith(".tmp")))
  }

  test("atomicFileCopy: a failing write leaves no partial file at the destination") {
    import graft.io.AtomicFiles
    val dir = Paths.get(tmpDir("atomic_fail"))
    val dst = dir.resolve("out.bin")
    // interrupted write via the file-shaped atomic sink: the writer dies
    // mid-stream; dst must not exist and no temp file may remain
    intercept[RuntimeException] {
      AtomicFiles.atomicOutputFile(dst) { tmp =>
        Files.write(tmp, Array.fill[Byte](1024)(1))
        throw new RuntimeException("disk on fire")
      }
    }
    assert(!Files.exists(dst), "failed write must not surface a partial dst")
    assert(!Files.list(dir).iterator().asScala.exists(_.toString.endsWith(".tmp")),
      "failed write must remove its temp file")
    // pre-existing dst survives a later failed overwrite attempt untouched
    Files.write(dst, Array.fill[Byte](8)(7))
    intercept[RuntimeException] {
      AtomicFiles.atomicOutputFile(dst) { tmp =>
        Files.write(tmp, Array.fill[Byte](1024)(2))
        throw new RuntimeException("again")
      }
    }
    assert(Files.readAllBytes(dst).toSeq == Seq.fill[Byte](8)(7))
  }

  test("atomicOutputDir: success swaps the tree in, failure leaves the old tree") {
    import graft.io.AtomicFiles
    val root = Paths.get(tmpDir("atomic_dir"))
    val out = root.resolve("table")
    AtomicFiles.atomicOutputDir(out) { tmp =>
      Files.write(tmp.resolve("part-0"), "v1".getBytes)
    }
    assert(Files.readAllBytes(out.resolve("part-0")).sameElements("v1".getBytes))
    intercept[RuntimeException] {
      AtomicFiles.atomicOutputDir(out) { tmp =>
        Files.write(tmp.resolve("part-0"), "v2".getBytes)
        throw new RuntimeException("writer died")
      }
    }
    assert(Files.readAllBytes(out.resolve("part-0")).sameElements("v1".getBytes),
      "failed dir write must leave the previous tree")
    assert(!Files.exists(root.resolve("table.tmp")))
  }
}

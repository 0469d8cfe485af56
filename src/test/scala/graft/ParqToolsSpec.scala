package graft

import org.apache.spark.sql.functions._

/** The facade's reference-shaped surface, driven end-to-end — including the
  * SURVEY §7.5 demo query with its DuckDB-validated expectation. */
class ParqToolsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val pt = ParqTools(spark)

  test("§7.5 demo: filter + project a real lineitem file") {
    val out = s"${tmpDir("pt")}/out.parquet"
    pt.filterParquetFile(sf("lineitem"), out,
      filterExpression = Some("l_quantity > 30 and l_discount <= 0.05"),
      columns = Some(Seq("l_orderkey", "l_quantity", "l_discount")))
    val r = spark.read.parquet(out)
    assert(r.columns.toSeq == Seq("l_orderkey", "l_quantity", "l_discount"))
    val expected = spark.read.parquet(sf("lineitem"))
      .filter($"l_quantity" > 30 && $"l_discount" <= 0.05).count()
    assert(r.count() == expected && expected > 0)
  }

  test("concat axis dispatch: tall unions, wide joins, bad axis raises") {
    val d = tmpDir("pt-concat")
    val f1 = s"$d/f1.parquet"; val f2 = s"$d/f2.parquet"
    graft.io.ParquetIO.writeSingleFile(Seq((1L, "A"), (2L, "B")).toDF("x", "a"), f1)
    graft.io.ParquetIO.writeSingleFile(Seq((1L, 0.5), (2L, 0.7)).toDF("x", "b"), f2)
    val tall = s"$d/tall.parquet"; val wide = s"$d/wide.parquet"
    pt.concatParquetFiles(Seq(f1, f1), tall, axis = 0, singleFile = true)
    assert(spark.read.parquet(tall).count() == 4)
    pt.concatParquetFiles(Seq(f1, f2), wide, axis = 1,
      indexColumns = Seq("x"), singleFile = true)
    assert(spark.read.parquet(wide).columns.toSet == Set("x", "a", "b"))
    assertThrows[IllegalArgumentException](pt.concatParquetFiles(Seq(f1), tall, axis = 2))
  }

  test("sort, dedup and reindex file round-trips") {
    val d = tmpDir("pt-idx")
    val in = s"$d/in.parquet"
    graft.io.ParquetIO.writeSingleFile(
      Seq((3L, "c"), (1L, "a"), (2L, "b"), (1L, "dup")).toDF("k", "v"), in)
    val sorted = s"$d/sorted.parquet"
    pt.sortParquetFile(in, sorted, Seq("k"), singleFile = true)
    assert(spark.read.parquet(sorted).select("k").as[Long].collect().toSeq == Seq(1L, 1L, 2L, 3L))
    val deduped = s"$d/dedup.parquet"
    pt.deduplicateParquet(in, deduped, Seq("k"), singleFile = true)
    assert(spark.read.parquet(deduped).count() == 3)
    val reindexed = s"$d/reindexed.parquet"
    pt.reindexParquet(in, reindexed, Seq(1L, 2L, 9L).toDF("k"), singleFile = true)
    val r = spark.read.parquet(reindexed)
    assert(r.count() == 4) // k=1 matches two rows, k=2 one, k=9 null-filled
    assert(r.filter($"k" === 9 && $"v".isNull).count() == 1)
  }

  test("metadata, compare, profile and lazy entries cohere") {
    val d = tmpDir("pt-meta")
    val in = s"$d/in.parquet"; val out = s"$d/out.parquet"
    graft.io.ParquetIO.writeSingleFile(
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), in)
    pt.renameAndUpdateMetadata(in, out,
      renameMap = Map("v" -> "value"),
      tableMetadata = Map("description" -> "facade test"),
      columnMetadata = Map("k" -> Map("description" -> "the key")))
    assert(pt.tableMetadata(out)("description") == "facade test")
    assert(pt.compareParquetFiles(out, out).allEqual)
    assert(pt.filesMatch(out, out))
    val summary = pt.compareParquetProfiles(Seq(out, out), Seq("l", "r"))
    assert(summary.overview.different == 0)
    val html = pt.profileReportHtml(out)
    assert(html.contains("facade test") && html.contains("the key"))
    assert(pt.lazyParquet(out).columns == Seq("k", "value"))
    assert(pt.memoryUsage(out).columns.nonEmpty)
  }

  test("Corpus facade drives a mini pipeline end to end") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf("documents"))
    val scored = docs.filter(Corpus.repetition.typeTokenRatio($"text") >= 0.3)
    val clean = Corpus.decontaminate.removeContaminated(
      scored.filter($"doc_id" % 10 =!= 0), "doc_id", "text",
      docs.filter($"doc_id" % 10 === 0), "text", shingleSize = 3, minOverlap = 50)
    val capped = Corpus.sampling.quotaPerGroup(
      clean.select($"doc_id", $"source", $"n_chars"),
      Seq("source"), Seq($"n_chars".desc, $"doc_id".asc), k = 10)
    val packed = Corpus.packing.packByBudget(capped, "doc_id", "n_chars", budget = 4096)
    assert(packed.count() > 0)
    assert(packed.columns.contains("pack_id") && packed.columns.contains("quota_rank"))
    // every stage only ever removed rows — pipeline is monotone
    assert(packed.count() <= docs.count())
    // retrieval + diagnostics entries reach their operators
    val q = Seq((0L, "spark table")).toDF("query_id", "qtext")
    assert(Corpus.search.bm25TopK(docs, "doc_id", "text", q,
      "query_id", "qtext", k = 3).count() == 3)
    assert(Corpus.stats.topNgrams(docs, "doc_id", "text", n = 2, k = 5).count() == 5)
  }

  test("Corpus facade: behavior, quality, drift and olap entries reach operators") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf("documents"))
    // publish gate: constraints + drift between two halves
    val report = Corpus.quality.validate(docs, Seq(
      graft.ops.QualityOps.NotNull("doc_id"),
      graft.ops.QualityOps.Unique(Seq("doc_id"))))
    assert(report.filter($"pass" === 1).count() == 2)
    val psi = Corpus.drift.psi(docs.filter($"doc_id" % 2 === 0),
      docs.filter($"doc_id" % 2 =!= 0), Seq("n_chars")).collect().head.getDouble(1)
    assert(psi >= 0.0 && psi < 0.1, s"random halves must not drift, psi=$psi")
    // engagement + olap entries
    val ev = graft.sources.EventsSource.read(spark, sf("events"))
    assert(Corpus.behavior.rollingActiveUsers(ev, "user_id", "ts").count() > 0)
    assert(Corpus.olap.rollupReport(docs, Seq("lang"),
      Seq(count(lit(1)).as("n"))).filter($"lang" === "(all)").count() == 1)
  }

  test("facade: atomicFileCopy and extractArchive delegate with reference semantics") {
    val pt = ParqTools(spark)
    val dir = java.nio.file.Paths.get(tmpDir("facade_util"))
    val src = dir.resolve("a.bin")
    java.nio.file.Files.write(src, Array.fill[Byte](4096)(3))
    val dst = pt.atomicFileCopy(src.toString, dir.resolve("b.bin").toString)
    assert(graft.io.FileHash.filesMatch(src.toString, dst.toString, "sha256"))
    val zip = dir.resolve("z.zip")
    val zo = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zip))
    zo.putNextEntry(new java.util.zip.ZipEntry("f.txt"))
    zo.write("hi".getBytes); zo.closeEntry(); zo.close()
    val out = pt.extractArchive(zip.toString, dir.resolve("out").toString)
    assert(out.size == 1 &&
      new String(java.nio.file.Files.readAllBytes(out.head)) == "hi")
  }
}

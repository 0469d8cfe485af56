package graft

import graft.profile.{ColumnProfiler, ProfileComparison, ProfileReport}

/** Alerts + YAML/HTML report outputs (reference parq_profile.py:158-175,
  * 305-319, 369-418; profile_utils.py:286-309 alerts). */
class ProfileReportSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 1.0, 0.0),
    (2L, "b", 1.0, Double.NaN),
    (3L, "c", 1.0, 2.5),
    (4L, "d", 1.0, Double.PositiveInfinity)
  ).toDF("id", "name", "const", "messy")

  test("alerts: unique, constant, missing, zeros, infinite") {
    val p = ColumnProfiler.profile(df)
    assert(p.variables("id").alerts.contains("unique"))
    assert(p.variables("const").alerts.contains("constant"))
    val messy = p.variables("messy").alerts
    assert(messy.contains("missing")) // NaN counts as missing
    assert(messy.contains("zeros"))
    assert(messy.contains("infinite"))
    assert(p.variables("const").alerts == Seq("constant"))
  }

  test("alerts: constant_length and uniform (ydata taxonomy widening)") {
    // name: 4 distinct single-char strings -> constant_length, not constant
    val p = ColumnProfiler.profile(df)
    assert(p.variables("name").alerts.contains("constant_length"))
    assert(!p.variables("name").alerts.contains("constant"))
    // varying lengths -> no constant_length
    val pv = ColumnProfiler.profile(Seq("a", "bb", "ccc").toDF("s"))
    assert(!pv.variables("s").alerts.contains("constant_length"))
    // an exactly flat histogram (1000 values, 100 per decile bin) passes
    // the chi-square uniform test; a skewed one does not
    val flat = ColumnProfiler.profile(
      (0 until 1000).map(i => (i % 10) + (i % 100) / 1000.0).toDF("u"),
      exactDistinct = true)
    assert(flat.variables("u").alerts.contains("uniform"))
    val skewed = ColumnProfiler.profile(
      ((0 until 900).map(_ => 0.1) ++ Seq(1.0, 5.0, 9.9)).toDF("v"),
      exactDistinct = true)
    assert(!skewed.variables("v").alerts.contains("uniform"))
  }

  test("alerts: skewed fires on |g1| > 20, not on symmetric data") {
    // 1-in-1000 spike: g1 = (1−2p)/√(p(1−p)) ≈ 31.6 > 20
    val spiky = (0 until 10000).map(i => if (i % 1000 == 0) 1e6 else 0.0).toDF("v")
    val ps = ColumnProfiler.profile(spiky)
    assert(ps.variables("v").alerts.contains("skewed"))
    assert(ps.variables("v").skewness.exists(_ > 20))
    // symmetric data: |g1| ≈ 0
    val sym = (-500 to 500).map(_.toDouble).toDF("v")
    assert(!ColumnProfiler.profile(sym).variables("v").alerts.contains("skewed"))
  }

  test("alerts: imbalance on a 97/3 categorical, not on balanced or numeric") {
    val df = (0 until 1000).map(i =>
      (if (i % 37 == 0) "rare" else "common",       // score ≈ 0.82 > 0.5
        if (i % 2 == 0) "a" else "b",               // balanced → ≈ 0
        i.toDouble))
      .toDF("lop", "even", "num")
    val p = ColumnProfiler.withImbalanceAlerts(df, ColumnProfiler.profile(df))
    assert(p.variables("lop").alerts.contains("imbalance"))
    assert(!p.variables("even").alerts.contains("imbalance"))
    assert(!p.variables("num").alerts.contains("imbalance")) // numeric: not categorical
  }

  test("alerts: duplicate-rows table alert counts repeats of identical rows") {
    val dup = Seq((1, "x"), (1, "x"), (2, "y"), (3, "z"), (1, "x")).toDF("k", "v")
    val p = ColumnProfiler.withDuplicateRowAlert(dup, ColumnProfiler.profile(dup))
    assert(p.nDuplicates.contains(2L)) // two repeats of (1, x)
    assert(p.tableAlerts == Seq("duplicates"))
    val uniq = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val pu = ColumnProfiler.withDuplicateRowAlert(uniq, ColumnProfiler.profile(uniq))
    assert(pu.nDuplicates.contains(0L) && pu.tableAlerts.isEmpty)
    // threshold: 2/5 duplicates below a 0.5 threshold → no alert, count kept
    val pt = ColumnProfiler.withDuplicateRowAlert(dup,
      ColumnProfiler.profile(dup), threshold = 0.5)
    assert(pt.nDuplicates.contains(2L) && pt.tableAlerts.isEmpty)
  }

  test("alerts: high_correlation flags tightly coupled numeric pairs only") {
    val d = Seq((1.0, 2.0, 5.0), (2.0, 4.0, -3.0), (3.0, 6.0, 9.0), (4.0, 8.0, 0.5))
      .toDF("x", "y", "noise")
    val p = ColumnProfiler.withCorrelationAlerts(d, ColumnProfiler.profile(d))
    assert(p.variables("x").alerts.contains("high_correlation"))   // y = 2x
    assert(p.variables("y").alerts.contains("high_correlation"))
    assert(!p.variables("noise").alerts.contains("high_correlation"))
  }

  test("chiSquareP: matches textbook chi-square tail values") {
    import graft.profile.Stat
    assert(Stat.chiSquareP(1, 0.0) == 1.0)
    // classic critical values: P(chi2_1 > 3.841) ~ 0.05, P(chi2_9 > 21.666) ~ 0.01
    assert(math.abs(Stat.chiSquareP(1, 3.841) - 0.05) < 1e-3)
    assert(math.abs(Stat.chiSquareP(9, 21.666) - 0.01) < 1e-3)
    assert(math.abs(Stat.chiSquareP(10, 9.342) - 0.5) < 1e-3)
  }

  test("profile HTML lists columns, stats and alert badges") {
    val p = ColumnProfiler.profile(df)
    val html = ProfileReport.toHtml(p, "spec report")
    assert(html.contains("spec report"))
    assert(html.contains("<td>messy</td>"))
    assert(html.contains("""<span class="alert">constant</span>"""))
    assert(html.contains("rows: 4"))
  }

  test("interaction grid: exact 2-D bin counts with pair bounds") {
    // 4 points on a known 2-bin grid: x in [0,10], y in [0,100]
    val pts = Seq((0.0, 0.0), (0.0, 100.0), (10.0, 100.0), (9.0, 99.0))
      .toDF("x", "y")
    val grid = ColumnProfiler.interactionGrid(pts, bins = 2).collect()
    val cells = grid.map(r => (r.getAs[Int]("bin_x"), r.getAs[Int]("bin_y")) ->
      r.getAs[Long]("n")).toMap
    // (0,0)→(0,0); (0,100)→(0,1); (10,100)→clamped (1,1); (9,99)→(1,1)
    assert(cells == Map((0, 0) -> 1L, (0, 1) -> 1L, (1, 1) -> 2L), s"got $cells")
    grid.foreach { r =>
      assert(r.getAs[String]("col_a") == "x" && r.getAs[String]("col_b") == "y")
      assert(r.getAs[Double]("lo_a") == 0.0 && r.getAs[Double]("hi_a") == 10.0)
      assert(r.getAs[Double]("lo_b") == 0.0 && r.getAs[Double]("hi_b") == 100.0)
    }
    // nulls in either coordinate drop from that pair's grid
    val withNull = pts.unionByName(
      Seq((Option.empty[Double], Option(5.0))).toDF("x", "y"))
    assert(ColumnProfiler.interactionGrid(withNull, bins = 2)
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0) == 4L)
  }

  test("interaction + sample sections render inside the profile page") {
    val pts = Seq((0.0, 0.0), (10.0, 100.0), (3.0, 42.0)).toDF("x", "y")
    val grid = ColumnProfiler.interactionGrid(pts, bins = 2).collect().toSeq
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b"),
        r.getAs[Int]("bin_x"), r.getAs[Int]("bin_y"), r.getAs[Long]("n"),
        r.getAs[Double]("lo_a"), r.getAs[Double]("hi_a"),
        r.getAs[Double]("lo_b"), r.getAs[Double]("hi_b")))
    val interactions = ProfileReport.interactionsHtml(grid, bins = 2)
    assert(interactions.contains("x × y") && interactions.contains("<rect"))
    assert(interactions.contains("[0, 10]") && interactions.contains("[0, 100]"))
    val samples = ProfileReport.sampleRowsHtml(pts, n = 2)
    assert(samples.contains("Sample (first 2 rows)"))
    assert(samples.contains("<th>x</th>") && samples.contains("<td>42.0</td>") == false)
    val page = ProfileReport.toHtml(ColumnProfiler.profile(pts), "with sections",
      extraSections = Seq(interactions, samples))
    assert(page.contains("Interactions") && page.contains("class=\"samples\""))
    assert(page.indexOf("</table>") < page.indexOf("Interactions"))
  }

  test("summary YAML round-trips through snakeyaml and keeps statuses") {
    val p1 = ColumnProfiler.profile(df.select("id", "const"))
    val p2 = ColumnProfiler.profile(df.select("id", "const")
      .withColumn("const", org.apache.spark.sql.functions.lit(2.0)))
    val s = ProfileComparison.compare(Seq(p1, p2), Seq("left", "right"))
    val yamlText = ProfileReport.toSummaryYaml(s)
    val loaded = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Any]](yamlText)
    assert(loaded.get("labels").toString == "[left, right]")
    val cols = loaded.get("columns").asInstanceOf[java.util.Map[String, Any]]
    val constCol = cols.get("const").asInstanceOf[java.util.Map[String, Any]]
    assert(constCol.get("status") == "different")
    val idCol = cols.get("id").asInstanceOf[java.util.Map[String, Any]]
    assert(idCol.get("status") == "equal")
  }

  test("writeOutputs writes comparison html, diff html and yaml atomically") {
    val p1 = ColumnProfiler.profile(df.select("id", "const"))
    val p2 = ColumnProfiler.profile(df.select("id", "const")
      .withColumn("const", org.apache.spark.sql.functions.lit(2.0)))
    val s = ProfileComparison.compare(Seq(p1, p2), Seq("left", "right"))
    val d = tmpDir("report")
    val written = ProfileReport.writeOutputs(s,
      comparisonHtmlPath = Some(s"$d/cmp.html"),
      diffHtmlPath = Some(s"$d/diff.html"),
      differencesYamlPath = Some(s"$d/diff.yaml"))
    assert(written.keySet == Set("comparison_html", "diff_html", "differences_yaml"))
    val cmp = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d/cmp.html")), java.nio.charset.StandardCharsets.UTF_8)
    val diff = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d/diff.html")), java.nio.charset.StandardCharsets.UTF_8)
    assert(cmp.contains("🔴 DIFF | const") && cmp.contains("🟢 SAME | id"))
    assert(diff.contains("const") && !diff.contains("🟢 SAME | id")) // diff view prunes equal columns
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$d/diff.yaml"))).contains("metrics_compared"))
  }

  test("profileFile keeps alerts and fills memory sizes") {
    val path = s"${tmpDir("pf")}/t.parquet"
    graft.io.ParquetIO.writeSingleFile(df, path)
    val p = ColumnProfiler.profileFile(spark, path)
    assert(p.variables("const").alerts.contains("constant"))
    assert(p.variables.values.forall(_.memorySize > 0))
  }

  test("structured column metadata renders reference-format descriptions") {
    // mirrors test_profile_report.py:127-149 expectation
    assert(ProfileReport.columnDescription(Map(
      "title" -> "Mass", "description" -> "Measured sample mass",
      "unit_of_measure" -> "kg", "source" -> "lab"))
      == "Mass: Measured sample mass (Units: kg; Source: lab)")
    assert(ProfileReport.columnDescription(Map("description" -> "plain")) == "plain")
    assert(ProfileReport.columnDescription(Map("units" -> "m")) == "Units: m")
  }

  test("profileFileHtml recovers dataset + column metadata from footers") {
    val d = tmpDir("meta-report")
    val p0 = s"$d/in.parquet"; val p1 = s"$d/t.parquet"
    graft.io.ParquetIO.writeSingleFile(df, p0)
    graft.ops.SchemaOps.updateMetadataFile(spark, p0, p1,
      tableMetadata = Map("description" -> "Test dataset with persisted metadata"),
      columnMetadata = Map("const" -> Map(
        "title" -> "Constant", "description" -> "always one", "units" -> "u")))
    assert(ProfileReport.columnDescriptionsFromFile(spark, p1)("const")
      == "Constant: always one (Units: u)")
    val html = ProfileReport.profileFileHtml(spark, p1, "meta report")
    assert(html.contains("Test dataset with persisted metadata"))
    assert(html.contains("Constant: always one (Units: u)"))
    assert(html.contains("<th>description</th>"))
  }

  test("three-way profile comparison reports per-dataset values") {
    val p1 = ColumnProfiler.profile(df.select("id"))
    val p2 = ColumnProfiler.profile(df.select("id"))
    val p3 = ColumnProfiler.profile(df.select("id")
      .withColumn("id", org.apache.spark.sql.functions.col("id") * 2))
    val s = ProfileComparison.compare(Seq(p1, p2, p3), Seq("a", "b", "c"))
    assert(s.labels == Seq("a", "b", "c"))
    assert(s.columns("id").status == "different")
    assert(s.columns("id").metrics("mean").values.size == 3)
    assertThrows[IllegalArgumentException](
      ProfileComparison.compare(Seq(p1, p2, p3), Seq("a", "b"))) // label arity
  }
}

package graft

import graft.ops.{AggOps, QualityOps}
import graft.ops.QualityOps._
import org.apache.spark.sql.functions._

class QualityOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("validate: rule types count violations with explicit null handling") {
    val df = Seq(
      (Some(1), Some(0.02), "A", "O"),
      (Some(2), Some(0.08), "X", "F"),  // range + set violations
      (None,    None,       "N", "zz"), // null id + null range + regex violations
      (Some(1), Some(0.01), "R", "O"))  // duplicate id
      .toDF("id", "rate", "flag", "status")
    val out = QualityOps.validate(df, Seq(
        NotNull("id"), InRange("rate", 0.0, 0.05), InSet("flag", Seq("A", "N", "R")),
        Matches("status", "^[OF]$"), Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getInt(5))).toMap
    assert(out("not_null(id)") == ((1L, 0)))
    assert(out("in_range(rate,0.0,0.05)") == ((2L, 0))) // 0.08 and NULL
    assert(out("in_set(flag)") == ((1L, 0)))
    assert(out("matches(status)") == ((1L, 0)))
    // unique over ids {1,2,null,1}: key 1 twice → 1 duplicate (nulls group too)
    assert(out("unique(id)") == ((1L, 0)))
    assert(out.values.forall(_._2 == 0))
  }

  test("validate: all-pass rules report pass=1 and rate 0") {
    val df = Seq((1, "A"), (2, "B")).toDF("id", "tag")
    val out = QualityOps.validate(df, Seq(NotNull("id"), Unique(Seq("id"))))
      .collect()
    assert(out.forall(r => r.getLong(3) == 0L && r.getInt(5) == 1
      && r.getDouble(4) == 0.0))
  }

  test("referential integrity counts orphans and null keys") {
    val fact = Seq(Some(1), Some(2), Some(9), None).toDF("k")
    val dim = Seq(1, 2, 3).toDF("d")
    val r = QualityOps.referentialIntegrity(fact, "k", dim, "d").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.25)
    val orphans = QualityOps.orphanRows(fact, "k", dim, "d")
      .collect().map(_.getInt(0))
    assert(orphans.toSeq == Seq(9))
  }

  test("rollupReport: subtotals, grand total, '(all)' labels, bitmask") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 4)).toDF("g1", "g2", "v")
    val out = AggOps.rollupReport(df, Seq("g1", "g2"),
        Seq(sum(col("v")).cast("long").as("sv")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("a", "x")) == ((1L, 0L)) && out(("a", "y")) == ((2L, 0L)))
    assert(out(("a", "(all)")) == ((3L, 1L)))     // g1 subtotal
    assert(out(("b", "(all)")) == ((4L, 1L)))
    assert(out(("(all)", "(all)")) == ((7L, 3L))) // grand total
  }

  test("pivotTable: explicit values fix the schema; absent cells are null") {
    val df = Seq(("r1", "a", 1), ("r1", "a", 2), ("r2", "b", 5)).toDF("r", "c", "v")
    val out = AggOps.pivotTable(df, "r", "c", Seq("a", "b", "zz"),
        sum(col("v")).cast("long"))
      .orderBy("r").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head == Seq("r", "a", "b", "zz"))
    assert(out(0).getLong(1) == 3L && out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(out(1).isNullAt(1) && out(1).getLong(2) == 5L)
  }

  test("kAnonymity: class sizes, risk share and null classes by hand") {
    import spark.implicits._
    // classes: (US,M)x3, (US,F)x2, (DE,M)x1, (null,M)x1
    val df = Seq(
      (1L, "US", "M"), (2L, "US", "M"), (3L, "US", "M"),
      (4L, "US", "F"), (5L, "US", "F"),
      (6L, "DE", "M"),
      (7L, null.asInstanceOf[String], "M")).toDF("id", "country", "g")
    val r = graft.ops.QualityOps.kAnonymity(df, Seq("country", "g"), k = 2).head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)     // rows, classes
    assert(r.getLong(2) == 1L)                           // achieved k
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)     // below-k classes/rows
    assert(r.getDouble(5) == BigDecimal(2.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!r.getBoolean(6))
    // k = 1 always passes (every class has >= 1 member)
    assert(graft.ops.QualityOps.kAnonymity(df, Seq("country", "g"), k = 1)
      .head().getBoolean(6))
  }

  test("lDiversity: min class diversity, all-null sensitive class has l = 0") {
    import spark.implicits._
    // classes: A -> {x,x,y} l=2; B -> {z} l=1; C -> {x,y,z} l=3;
    //          D -> {null,null} l=0
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "z"),
      ("C", "x"), ("C", "y"), ("C", "z"),
      ("D", null.asInstanceOf[String]), ("D", null.asInstanceOf[String]))
      .toDF("q", "s")
    val r = QualityOps.lDiversity(df, Seq("q"), "s", l = 2).head()
    assert(r.getLong(0) == 9L && r.getLong(1) == 4L)  // rows, classes
    assert(r.getLong(2) == 0L)                        // achieved l (class D)
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L)  // B + D, 1 + 2 rows
    assert(r.getDouble(5) == BigDecimal(3.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!r.getBoolean(6))
    assert(QualityOps.lDiversity(df.filter(col("q") =!= "D"), Seq("q"), "s", l = 1)
      .head().getBoolean(6))
  }

  test("benfordTest: digit extraction with boundary corrections, all 9 rows") {
    import spark.implicits._
    // usable: 1.0, 1.5, 19.0 -> d1; 2.0 -> d2; 300.0 -> d3; -4.0 -> d4;
    // 1000.0 -> d1 (10-correction path if log10 misrounds); 999.9 -> d9;
    // 0.002 -> d2; excluded: 0, null, NaN
    val df = Seq[java.lang.Double](1.0, 1.5, 19.0, 2.0, 300.0, -4.0,
      1000.0, 999.9, 0.002, 0.0, null, Double.NaN).toDF("v")
    val rows = QualityOps.benfordTest(df, "v")
      .orderBy(col("digit")).collect()
    assert(rows.length == 9)
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit == Map(1 -> 4L, 2 -> 2L, 3 -> 1L, 4 -> 1L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L))
    assert(math.abs(rows(0).getDouble(3) - math.log10(2.0)) < 1e-12)
    assert(math.abs(rows(0).getDouble(2) - 4.0 / 9.0) < 1e-12)
    // the total chi2 repeats on every row and is strictly positive
    val chi2 = rows.map(_.getDouble(4)).distinct
    assert(chi2.length == 1 && chi2.head > 0.0)
  }

  test("ebShrinkRates: MoM prior shrinks small-sample rates toward the mean") {
    // per-key rates {0.2, 0.3, 0.4, 0.3}: m = 0.3, v = 0.02/3
    val rows = Seq(("A", 2), ("B", 3), ("C", 4), ("D", 3)).flatMap {
      case (key, k) => (0 until 10).map(i => (key, i < k))
    }.toDF("key", "s")
    val out = QualityOps.ebShrinkRates(rows, "key", "s")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val m = 0.3; val v = 0.02 / 3
    val common = m * (1 - m) / v - 1
    val (al, be) = (m * common, (1 - m) * common)
    assert(math.abs(out("A")._3 - al) < 1e-9 && math.abs(out("A")._4 - be) < 1e-9)
    assert(math.abs(out("A")._2 - (2 + al) / (10 + al + be)) < 1e-9)
    // shrinkage direction: below-mean keys move up, above-mean move down
    assert(out("A")._2 > out("A")._1 && out("C")._2 < out("C")._1)
    // degenerate prior (zero variance across keys) -> raw rates, NULL prior
    val flat = Seq(("A", true), ("A", false), ("B", true), ("B", false))
      .toDF("key", "s")
    val f = QualityOps.ebShrinkRates(flat, "key", "s").collect().head
    assert(f.getDouble(3) == f.getDouble(4) && f.isNullAt(5))
  }

  test("unicodeAnomalies: replacement, control, homoglyph-mix and shares") {
    val docs = Seq(
      ("en", "hello � world"),   // one replacement char
      ("en", "ok\u0001"),            // one C0 control
      ("en", "mix яz"),         // Latin + Cyrillic ya -> mixed script
      ("en", "plain text\twith\ntabs"), // \t \n are NOT control here
      ("ru", "пример")) // Cyrillic only: not mixed
      .toDF("lang", "text")
    val byLang = QualityOps.unicodeAnomalies(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = byLang("en")
    assert(en.getLong(1) == 4L)
    assert(en.getLong(2) == 1L, "one doc with U+FFFD")
    assert(en.getLong(3) == 1L, "one doc with a C0 control")
    assert(en.getLong(4) == 1L, "one Latin+Cyrillic doc")
    // en non-ASCII chars: FFFD + \x01 + cyrillic ya = 3
    val enChars = "hello � world".length + "ok\u0001".length +
      "mix яz".length + "plain text\twith\ntabs".length
    assert(math.abs(en.getDouble(5) - 3.0 / enChars) < 1e-12)
    val ru = byLang("ru")
    assert(ru.getLong(4) == 0L, "Cyrillic-only is not mixed-script")
    assert(math.abs(ru.getDouble(5) - 1.0) < 1e-12, "all chars non-ASCII")
  }

  test("tCloseness: hand EMD on a 2-value domain; balanced classes pass") {
    import graft.ops.QualityOps
    // global {1,1,2,2}: pcum = (0.5, 1). class A = {1,1}: qcum (1,1) ->
    // EMD 0.5; class B = {2,2}: qcum (0,1) -> EMD 0.5
    val skew = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2)).toDF("q", "v")
    val r = QualityOps.tCloseness(skew, Seq("q"), "v", t = 0.4)
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(r.getLong(3) == 2L && r.getLong(4) == 4L && !r.getBoolean(6))
    // each class mirrors the global distribution -> EMD 0, pass
    val bal = Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2)).toDF("q", "v")
    val rb = QualityOps.tCloseness(bal, Seq("q"), "v", t = 0.4)
      .collect().head
    assert(rb.getDouble(2) == 0.0 && rb.getBoolean(6))
    // single-value domain: trivially t-close
    val one = Seq(("A", 7), ("B", 7)).toDF("q", "v")
    assert(QualityOps.tCloseness(one, Seq("q"), "v", t = 0.1)
      .collect().head.getBoolean(6))
  }

  test("sprtGate: hand llr at p0=0.2/p1=0.8; all three decisions") {
    import graft.ops.QualityOps
    // llr = k ln4 + (n-k) ln(1/4): k=9,n=10 -> 8 ln4 = 11.09 > upper 2.944
    def df(k: Int, n: Int) =
      (Seq.fill(k)(true) ++ Seq.fill(n - k)(false)).toDF("s")
    val rej = QualityOps.sprtGate(df(9, 10), "s", 0.2, 0.8).collect().head
    assert(rej.getLong(0) == 10L && rej.getLong(1) == 9L)
    assert(math.abs(rej.getDouble(2) - 8 * math.log(4.0)) < 1e-9)
    assert(math.abs(rej.getDouble(4) - math.log(0.95 / 0.05)) < 1e-12)
    assert(rej.getString(5) == "reject_h0")
    val acc = QualityOps.sprtGate(df(1, 10), "s", 0.2, 0.8).collect().head
    assert(acc.getString(5) == "accept_h0")
    // k = 5: llr = 0 sits strictly between the Wald boundaries
    val cont = QualityOps.sprtGate(df(5, 10), "s", 0.2, 0.8).collect().head
    assert(math.abs(cont.getDouble(2)) < 1e-9)
    assert(cont.getString(5) == "continue")
  }
}

package graft

import graft.expr.{FilterParseException, SparkCompiler}
import graft.io.ParquetIO
import graft.ops.FilterOps

/** Mirrors /root/reference/test/filter/test_filter.py semantics. */
class FilterOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "a"))
    .toDF("x", "v", "s")

  test("expression filter + projection") {
    val out = FilterOps.filter(df, Some("v > 15.0 and s != 'c'"), Some(Seq("x")))
    assert(out.columns.toSeq == Seq("x"))
    assert(out.as[Int].collect().sorted.toSeq == Seq(2, 4))
  }

  test("index columns always prepended and deduped") {
    val out = FilterOps.filter(df, None, Some(Seq("v", "x")), indexColumns = Seq("x"))
    assert(out.columns.toSeq == Seq("x", "v"))
  }

  test("none filter keeps all rows") {
    assert(FilterOps.filter(df, None, None).count() == 4)
  }

  test("unknown filter column raises with the missing names") {
    val ex = intercept[FilterParseException](FilterOps.filter(df, Some("nope > 1")))
    assert(ex.getMessage.contains("nope"))
  }

  test("unknown projection column raises") {
    val ex = intercept[IllegalArgumentException](FilterOps.filter(df, None, Some(Seq("zz"))))
    assert(ex.getMessage.contains("zz"))
  }

  test("in-list filters: values, empty list, strings") {
    assert(FilterOps.filter(df, Some("x in [1, 3]")).count() == 2)
    assert(FilterOps.filter(df, Some("x in []")).count() == 0)
    assert(FilterOps.filter(df, Some("s in ['a']")).count() == 2)
  }

  test("and/or precedence matches pandas") {
    // x == 1 or (x == 2 and s == 'zzz') → only x == 1
    assert(FilterOps.filter(df, Some("x == 1 or x == 2 and s == 'zzz'")).count() == 1)
  }

  test("file to file with pushdown on real testdata") {
    val out = tmpDir("filter") + "/out.parquet"
    FilterOps.filterFile(spark, sf("lineitem"), out,
      Some("l_quantity > 30 and l_discount <= 0.05"),
      Some(Seq("l_orderkey", "l_quantity", "l_discount")))
    val got = ParquetIO.read(spark, out)
    assert(got.columns.toSeq == Seq("l_orderkey", "l_quantity", "l_discount"))
    val expected = spark.read.parquet(sf("lineitem"))
      .filter($"l_quantity" > 30 && $"l_discount" <= 0.05).count()
    assert(got.count() == expected && expected > 0)
  }

  test("predicate is pushed into the parquet scan") {
    val plan = spark.read.parquet(sf("lineitem"))
      .filter(SparkCompiler.compile("l_quantity > 30.0"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.expr.FilterParseException
import graft.ops.ConcatOps

/** Mirrors /root/reference/test/concat/ semantics (tall/wide/with-dataframe). */
class ConcatOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val f1 = Seq((1, 10.0), (2, 20.0)).toDF("x", "a")
  private lazy val f2 = Seq((3, 1.5, "u"), (4, 2.5, "v")).toDF("x", "a", "b")

  test("tall concat unifies schemas with null injection, first-seen order") {
    val out = ConcatOps.tall(Seq(f1, f2))
    assert(out.columns.toSeq == Seq("x", "a", "b"))
    assert(out.count() == 4)
    assert(out.filter($"b".isNull).count() == 2) // f1 rows got null b
  }

  test("tall concat filter validated against each dataset's schema") {
    val ex = intercept[FilterParseException](ConcatOps.tall(Seq(f1, f2), Some("b == 'u'")))
    assert(ex.getMessage.contains("b"))
  }

  test("tall concat per-dataset filter applied before union") {
    val out = ConcatOps.tall(Seq(f1, f2), Some("a > 5.0"))
    assert(out.count() == 2) // both f1 rows pass; no f2 rows do
  }

  test("wide concat joins on index columns") {
    val left = Seq((1, "p"), (2, "q")).toDF("x", "c1")
    val right = Seq((1, 9.0), (2, 8.0)).toDF("x", "c2")
    val out = ConcatOps.wide(Seq(left, right), Seq("x"))
    assert(out.columns.toSeq == Seq("x", "c1", "c2"))
    assert(out.orderBy("x").collect().map(_.getDouble(2)).toSeq == Seq(9.0, 8.0))
  }

  test("wide concat rejects misaligned indexes") {
    val left = Seq((1, "p")).toDF("x", "c1")
    val right = Seq((2, 9.0)).toDF("x", "c2")
    assertThrows[IllegalArgumentException](ConcatOps.wide(Seq(left, right), Seq("x")))
  }

  test("wide concat rejects duplicate non-index columns") {
    val left = Seq((1, "p")).toDF("x", "c1")
    val right = Seq((1, "q")).toDF("x", "c1")
    assertThrows[IllegalArgumentException](ConcatOps.wide(Seq(left, right), Seq("x")))
  }

  test("concat with in-memory dataframe is a broadcast left join") {
    val file = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("x", "a")
    val mem = Seq((1, "m1"), (2, "m2")).toDF("x", "extra")
    val out = ConcatOps.withDataFrame(file, mem, Seq("x"))
    assert(out.count() == 3) // left join keeps all file rows
    assert(out.filter($"extra".isNull).count() == 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("concat with dataframe rejects duplicate keys in the memory side") {
    val file = Seq((1, 10.0)).toDF("x", "a")
    val mem = Seq((1, "m1"), (1, "m2")).toDF("x", "extra")
    assertThrows[IllegalArgumentException](ConcatOps.withDataFrame(file, mem, Seq("x")))
  }

  test("concat with dataframe rejects overlapping non-key columns") {
    val file = Seq((1, 10.0)).toDF("x", "a")
    val mem = Seq((1, 99.0)).toDF("x", "a")
    assertThrows[IllegalArgumentException](ConcatOps.withDataFrame(file, mem, Seq("x")))
  }

  test("tall concat of real files matches unionByName") {
    val li = spark.read.parquet(sf("lineitem")).select("l_orderkey", "l_quantity")
    val out = ConcatOps.tall(Seq(li, li))
    assert(out.count() == 2 * li.count())
  }
}

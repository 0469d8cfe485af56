package graft

import graft.ops.CompareOps

/** Mirrors /root/reference/test/compare/test_compare.py contract. */
class CompareOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("identical frames compare equal") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val r = CompareOps.compare(a, a)
    assert(r.allEqual && r.columnsMatch && r.numRowsMatch)
    assert(r.columns.values.forall(identity))
  }

  test("different values detected per column") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((1, "x"), (2, "z")).toDF("k", "v")
    val r = CompareOps.compare(a, b)
    assert(!r.allEqual)
    assert(r.columns("k") && !r.columns("v"))
  }

  test("missing columns reported left/right") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq(1).toDF("k")
    val r = CompareOps.compare(a, b)
    assert(!r.columnsMatch)
    assert(r.missingColumns.leftOnly == Seq("v") && r.missingColumns.rightOnly.isEmpty)
    assert(!r.columns("v"))
  }

  test("dtype mismatch reported and column marked unequal") {
    val a = Seq((1, 1L)).toDF("k", "v")
    val b = Seq((1, "1")).toDF("k", "v")
    val r = CompareOps.compare(a, b)
    assert(!r.dtypes("v").matches && !r.columns("v"))
    assert(r.dtypes("v").left.contains("bigint") && r.dtypes("v").right.contains("string"))
  }

  test("row count mismatch") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(1, 2).toDF("k")
    val r = CompareOps.compare(a, b)
    assert(!r.numRowsMatch && r.numRowsLeft == 3 && r.numRowsRight == 2)
  }

  test("diffCounts multiset semantics") {
    val a = Seq(1, 1, 2, 3).toDF("k")
    val b = Seq(1, 2, 2, 4).toDF("k")
    val row = CompareOps.diffCounts(a, b).head()
    assert(row.getLong(0) == 2) // one extra 1, the 3
    assert(row.getLong(1) == 2) // one extra 2, the 4
    assert(row.getLong(2) == 2) // one 1, one 2
  }

  test("real file compares equal to itself including footer metadata") {
    val r = CompareOps.compareFiles(spark, sf("region"), sf("region"))
    assert(r.allEqual && r.metadata)
  }
}

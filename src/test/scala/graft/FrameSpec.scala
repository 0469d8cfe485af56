package graft

import org.apache.spark.sql.functions._
import graft.frame.{CalculatedColumn, LazyParquetFrame}
import graft.ops.SchemaOps

/** Mirrors /root/reference/test/lazy_parquet/ + calculated_columns tests. */
class FrameSpec extends SparkSpecBase {
  import spark.implicits._

  test("lazy frame: columns, getitem, status tracking") {
    val lp = LazyParquetFrame(spark, sf("region"), Seq("r_regionkey"))
    assert(lp.columns == Seq("r_regionkey", "r_name"))
    assert(lp.info.exists { case (c, _, st) => c == "r_regionkey" && st == "loaded" })
    assert(lp.info.exists { case (c, _, st) => c == "r_name" && st == "lazy" })
    assert(lp("r_name").count() == 5)
    assert(lp.info.forall(_._3 == "loaded"))
  }

  test("lazy frame: unknown column raises, setitem adds") {
    val lp = LazyParquetFrame(spark, sf("region"))
    assertThrows[NoSuchElementException](lp("nope"))
    lp.update("upper_name", upper($"r_name"))
    assert(lp.columns.contains("upper_name"))
    assertThrows[IllegalArgumentException](lp.addColumn("upper_name", lit(1)))
  }

  test("deprecated-surface parity: whole-frame arithmetic stays lazy and element-wise") {
    // reference LazyParquetDataFrame.__add__ .. (lazy_parquet.py:899-1038):
    // scalar ops broadcast over numeric columns; index/non-numerics pass
    val lp = LazyParquetFrame(spark, sf("customer"), Seq("c_custkey"))
    val plus = (lp + 10.0).select("c_custkey", "c_acctbal", "c_name")
    val base = spark.read.parquet(sf("customer"))
      .select($"c_custkey", ($"c_acctbal" + 10.0).as("c_acctbal"), $"c_name")
    assert(plus.exceptAll(base).isEmpty && base.exceptAll(plus).isEmpty)
    // index column c_custkey untouched; string column untouched
    val neg = (-lp).agg(sum($"c_custkey")).head().getLong(0)
    val pos = spark.read.parquet(sf("customer")).agg(sum($"c_custkey")).head().getLong(0)
    assert(neg == pos, "index column must not be negated")
    // comparison dunder: numeric -> boolean
    val gt = (lp > 0.0)
    assert(gt.schema("c_acctbal").dataType.typeName == "boolean")
    assert(gt.schema("c_name").dataType.typeName == "string")
    // in-place variant rebinds the plan (reference __iadd__)
    val before = lp.df.agg(sum($"c_acctbal")).head().getDouble(0)
    lp.transformInPlace(_ * 2)
    val after = lp.df.agg(sum($"c_acctbal")).head().getDouble(0)
    assert(math.abs(after - 2 * before) < 1e-6)
  }

  test("deprecated-surface parity: drop, rename, resetIndex bookkeeping") {
    val lp = LazyParquetFrame(spark, sf("region"), Seq("r_regionkey"))
    assertThrows[NoSuchElementException](lp.drop("nope"))
    assert(lp.drop("r_name").columns.toSeq == Seq("r_regionkey"))
    lp.rename(Map("r_regionkey" -> "rk"))
    assert(lp.indexColumns == Seq("rk") && lp.columns.contains("rk"))
    lp.resetIndex()
    assert(lp.indexColumns.isEmpty && lp.columns.contains("rk"))
    val lp2 = LazyParquetFrame(spark, sf("region"), Seq("r_regionkey"))
    lp2.resetIndex(dropCols = true)
    assert(lp2.columns == Seq("r_name"))
  }

  test("lazy frame: tuple filter returns only predicate columns") {
    val lp = LazyParquetFrame(spark, sf("customer"))
    val out = lp.filter(("c_acctbal", ">", 0.0), ("c_nationkey", "<=", 10))
    assert(out.columns.toSeq == Seq("c_acctbal", "c_nationkey"))
  }

  test("lazy frame: query uses the expression dialect") {
    val lp = LazyParquetFrame(spark, sf("customer"))
    val n = lp.query("c_mktsegment == 'BUILDING' and c_acctbal > 0.0").count()
    val expected = spark.read.parquet(sf("customer"))
      .filter($"c_mktsegment" === "BUILDING" && $"c_acctbal" > 0.0).count()
    assert(n == expected)
  }

  test("lazy frame: describe() full and stat-selected") {
    val lp = LazyParquetFrame(spark, sf("region"))
    val full = lp.describe()
    assert(full.columns.head == "summary")
    assert(full.select("summary").as[String].collect().contains("mean"))
    val sel = lp.describe("count", "max")
    assert(sel.select("summary").as[String].collect().toSet == Set("count", "max"))
    assert(sel.filter($"summary" === "count")
      .select("r_regionkey").as[String].head() == "5")
  }

  test("lazy frame: overwrite guard on save") {
    val out = tmpDir("lpf") + "/out.parquet"
    val lp = LazyParquetFrame(spark, sf("region"))
    lp.toParquet(out)
    assertThrows[IllegalArgumentException](lp.toParquet(out))
    lp.toParquet(out, allowOverwrite = true)
  }

  test("lazy frame: save() overwrites its own source path (dir and single file)") {
    // directory-backed frame
    val dir = tmpDir("lpf-save") + "/tbl"
    spark.read.parquet(sf("region")).write.parquet(dir)
    val lp = LazyParquetFrame(spark, dir)
    lp.update("upper_name", upper($"r_name"))
    lp.save() // would throw 'Cannot overwrite a path that is also being read from' unswapped
    val reread = spark.read.parquet(dir)
    assert(reread.columns.contains("upper_name"))
    assert(reread.count() == 5)
    // single-file-backed frame
    val file = tmpDir("lpf-save-file") + "/tbl.parquet"
    graft.io.ParquetIO.writeSingleFile(spark.read.parquet(sf("region")), file)
    val lpf = LazyParquetFrame(spark, file)
    lpf.update("k2", $"r_regionkey" * 2)
    lpf.save()
    assert(spark.read.parquet(file).columns.contains("k2"))
    assert(lpf.df.count() == 5) // frame still usable after the swap
  }

  test("calculated columns: placement after last dependency") {
    val df = Seq((1.0, 2.0, "z")).toDF("a", "b", "s")
    val out = CalculatedColumn(df, Seq(CalculatedColumn("ab", "a + b")))
    assert(out.columns.toSeq == Seq("a", "b", "ab", "s"))
    assert(out.head().getDouble(2) == 3.0)
  }

  test("calculated columns: sequential insert-after-last-dependency order") {
    // Matches the reference's order.insert(last_dep + 1, name) behavior:
    // s (deps a,b) → (a,b,s); s2 (dep a) → inserted right after a.
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val out = CalculatedColumn(df, Seq(
      CalculatedColumn("s", "a + b"),
      CalculatedColumn("s2", "a * 2")))
    assert(out.columns.toSeq == Seq("a", "s2", "b", "s"))
    // a calc column depending on an earlier calc column lands after it
    val chained = CalculatedColumn(df, Seq(
      CalculatedColumn("c", "a + b"),
      CalculatedColumn("d", "c * 2")))
    assert(chained.columns.toSeq == Seq("a", "b", "c", "d"))
    assert(chained.head().getDouble(3) == 6.0)
  }

  test("schema ops: rename and metadata") {
    val df = Seq((1, "x")).toDF("k", "v")
    val renamed = SchemaOps.rename(df, Map("k" -> "key"))
    assert(renamed.columns.toSeq == Seq("key", "v"))
    assertThrows[IllegalArgumentException](SchemaOps.rename(df, Map("zz" -> "y")))

    val md = SchemaOps.withColumnMetadata(df, Map("k" -> Map("unit" -> "meters")))
    assert(SchemaOps.columnMetadata(md, "k").getString("unit") == "meters")

    val tm = SchemaOps.withTableMetadata(df, Map("origin" -> "graft"))
    assert(SchemaOps.columnMetadata(tm, "k").getString(SchemaOps.TableMetadataKey)
      .contains("origin"))
  }

  test("column metadata round-trips through parquet") {
    val out = tmpDir("meta") + "/m.parquet"
    val df = SchemaOps.withColumnMetadata(Seq((1, "x")).toDF("k", "v"),
      Map("k" -> Map("unit" -> "meters")))
    df.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(SchemaOps.columnMetadata(back, "k").getString("unit") == "meters")
  }

  test("schema compatibility report classifies widening vs breaking changes") {
    import org.apache.spark.sql.types._
    val oldS = StructType(Seq(
      StructField("id", IntegerType), StructField("price", FloatType),
      StructField("gone", StringType), StructField("same", StringType)))
    val newS = StructType(Seq(
      StructField("id", LongType),            // widened
      StructField("price", IntegerType),      // narrowed -> incompatible
      StructField("same", StringType),        // unchanged
      StructField("fresh", DoubleType)))      // added
    val out = graft.ops.SchemaOps.compatibilityReport(spark, oldS, newS)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("id" -> "widened", "price" -> "incompatible",
      "gone" -> "removed", "same" -> "unchanged", "fresh" -> "added"))
  }

  test("loc: label lookup on the index, (row, col) form, filter pushes to scan") {
    val lp = LazyParquetFrame(spark, sf("nation"), Seq("n_nationkey"))
    val row = lp.loc(3).collect()
    assert(row.length == 1 && row.head.getAs[String]("n_name") == "NATION_3")
    // (row_key, col_key): index columns stay, projection applies
    val rc = lp.loc(Seq(3), Seq("n_name"))
    assert(rc.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(rc.head().getString(1) == "NATION_3")
    // label equality reaches the parquet scan
    val plan = lp.loc(3).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"),
      s"loc filter must push down:\n$plan")
    // no index → loc is meaningless
    val noIdx = LazyParquetFrame(spark, sf("nation"))
    assertThrows[IllegalStateException](noIdx.loc(3))
    // arity mismatch against a MultiIndex
    val multi = LazyParquetFrame(spark, sf("nation"), Seq("n_nationkey", "n_regionkey"))
    assertThrows[IllegalArgumentException](multi.loc(3))
    assert(multi.loc(3, 3).count() == 1)
    // the varargs overload binds loc(Seq(3)) as ONE Seq-typed label — a
    // pointed usage error, not a deferred lit() analysis failure
    val e = intercept[IllegalArgumentException](lp.loc(Seq(3)))
    assert(e.getMessage.contains("scalar"), e.getMessage)
  }

  test("loc: label assignment rewrites matching rows only; new column is NULL elsewhere") {
    val lp = LazyParquetFrame(spark, sf("nation"), Seq("n_nationkey"))
    lp.locSet(Seq(3), "n_comment", "patched")
    val byKey = lp.df.select("n_nationkey", "n_comment").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byKey(3) == "patched")
    assert(byKey(4) != "patched", "non-matching rows must keep their value")
    // assignment into a NEW column: value on the match, NULL elsewhere
    lp.locSet(Seq(5), "flag", 1)
    val flags = lp.df.select("n_nationkey", "flag").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(flags(5).contains(1) && flags(4).isEmpty)
  }

}

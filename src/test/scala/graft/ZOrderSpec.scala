package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("mortonKey interleaves bits: bit i of cell j lands at i*k + j") {
    // x = 0b101 (5), y = 0b011 (3) at 3 bits, k = 2:
    // out bit 0 = x0=1, bit 1 = y0=1, bit 2 = x1=0, bit 3 = y1=1,
    // bit 4 = x2=1, bit 5 = y2=0  ->  0b011011 = 27
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.mortonKey(Seq(col("x"), col("y")), 3).as("z"))
      .head()
    assert(row.getLong(0) == 27L)
    // single column degenerates to the identity on [0, 2^bits)
    val ident = Seq(13L).toDF("x")
      .select(ZOrder.mortonKey(Seq(col("x")), 4).as("z")).head()
    assert(ident.getLong(0) == 13L)
  }

  test("mortonSql replays mortonKey bit-for-bit (one definition, two engines)") {
    val df = (0 until 200).map(i => (i.toLong * 37 % 64, i.toLong * 53 % 64))
      .toDF("x", "y")
    val viaColumn = ZOrder.mortonKey(Seq(col("x"), col("y")), 6)
    val viaSql = expr(ZOrder.mortonSql(Seq("x", "y"), 6))
    assert(df.filter(viaColumn =!= viaSql).isEmpty,
      "generated SQL must agree with the Column form on every row")
  }

  test("fixedPointCell: exact integer cells, clamped, null -> 0") {
    val df = Seq(Some(0L), Some(500000L), Some(1000000L), None).toDF("v")
    val cells = df.select(
      ZOrder.fixedPointCell(col("v"), 0L, 1000000L, 16).as("c"),
      expr(ZOrder.fixedPointCellSql("v", 0L, 1000000L, 16)).as("s"))
      .collect()
    assert(cells.forall(r => r.getLong(0) == r.getLong(1)),
      "SQL mirror must agree with the Column form")
    val byV = cells.map(_.getLong(0))
    assert(byV(0) == 0L && byV(2) == 65535L && byV(3) == 0L) // lo, hi, null
    assert(byV(1) == 32767L) // floor(0.5 * 65535)
    // degenerate range: everything in cell 0
    val const = Seq(7L).toDF("v")
      .select(ZOrder.fixedPointCell(col("v"), 7L, 7L, 16)).head()
    assert(const.getLong(0) == 0L)
  }

  test("zOrderWrite shrinks the second column's per-row-group ranges") {
    // 64x64 grid in row-major (x-sorted) order: a plain write gives
    // near-full y-ranges in every row group; the z-ordered layout must cut
    // the summed y-extent substantially (that's the whole point of the
    // curve - multi-column pruning)
    val grid = spark.range(64L * 64)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    grid.repartitionByRange(8, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite")
      .option("parquet.block.size", 16 * 1024) // several row groups per file
      .parquet(s"$base/natural")
    ZOrder.zOrderWrite(grid, Seq("x", "y"), s"$base/zorder", numFiles = 8, bits = 6)

    // rowGroupStats reads the FIRST part file of a directory — partition 0
    // of each layout; compare the MEAN per-row-group y-extent so differing
    // row-group splits can't skew the comparison
    def ySpanAvg(path: String): Double =
      graft.io.ParquetIO.rowGroupStats(spark, path, Seq("y"))
        .agg(avg(col("max_val") - col("min_val"))).head().getDouble(0)
    val (natural, zordered) = (ySpanAvg(s"$base/natural"), ySpanAvg(s"$base/zorder"))
    assert(zordered < natural * 0.8,
      s"z-order must shrink y ranges: natural=$natural zordered=$zordered")

    // layout only - row content survives the rewrite exactly
    val back = spark.read.parquet(s"$base/zorder")
    assert(back.count() == 64L * 64)
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
  }
}

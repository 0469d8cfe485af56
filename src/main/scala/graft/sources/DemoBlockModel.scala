package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo 3-D block-model generator (SURVEY §2.1 S7, §2.8 F5; reference
  * /root/reference/parq_tools/utils/demo_block_model.py:7-74).
  *
  * The reference meshgrids numpy arrays in memory; here the grid derives
  * from `spark.range(n)` with integer div/mod — fully distributed, so a
  * 100 M-block model (the reference's perf-test scale) is 100 M cheap
  * codegen rows, not a driver-side allocation.
  *
  * Columns (reference parity): x/y/z block-centroid coordinates,
  * `c_order_xyz` (row id in x,y,z-major order), `f_order_zyx` (row id in
  * z,y,x-major order), `depth` (topo surface minus centroid z). Rows come
  * back in C order.
  */
object DemoBlockModel {

  def create(
      spark: SparkSession,
      shape: (Int, Int, Int) = (3, 3, 3),
      blockSize: (Double, Double, Double) = (1.0, 1.0, 1.0),
      corner: (Double, Double, Double) = (0.0, 0.0, 0.0)): DataFrame = {
    val (nx, ny, nz) = shape
    val (bx, by, bz) = blockSize
    val (cx, cy, cz) = corner
    val n = nx.toLong * ny * nz
    // topo surface = top face of the highest block layer
    val surface = cz + bz / 2 + (nz - 1) * bz + bz / 2

    spark.range(n)
      .withColumn("i", (col("id") / (ny.toLong * nz)).cast("long"))
      .withColumn("j", ((col("id") / nz) % ny).cast("long"))
      .withColumn("k", (col("id") % nz).cast("long"))
      .select(
        (lit(cx) + lit(bx / 2) + col("i") * lit(bx)).as("x"),
        (lit(cy) + lit(by / 2) + col("j") * lit(by)).as("y"),
        (lit(cz) + lit(bz / 2) + col("k") * lit(bz)).as("z"),
        col("id").as("c_order_xyz"),
        (col("k") * (nx.toLong * ny) + col("j") * nx + col("i")).as("f_order_zyx"),
        (lit(surface) - (lit(cz) + lit(bz / 2) + col("k") * lit(bz))).as("depth"))
  }

  def createFile(spark: SparkSession, path: String,
      shape: (Int, Int, Int) = (3, 3, 3),
      blockSize: (Double, Double, Double) = (1.0, 1.0, 1.0),
      corner: (Double, Double, Double) = (0.0, 0.0, 0.0)): Unit =
    create(spark, shape, blockSize, corner).write.mode("overwrite").parquet(path)
}

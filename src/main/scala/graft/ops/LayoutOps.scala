package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.kernels.LayoutKernelFunctions

/** Physical data-layout operators — the levers that decide how much of a
  * 100 TB table a query has to READ, before any engine work starts:
  * Z-order clustering (multi-column min/max locality for row-group
  * skipping) and small-file compaction (metadata + open-cost hygiene).
  */
object LayoutOps {

  /** Morton z-value over `cols`, each linearly bucketized into `bits`-wide
    * ints using the given (min, max) ranges (nulls and out-of-range values
    * clamp to the edge buckets). The interleave is a compiled kernel —
    * one codegen'd projection, no shuffle. */
  def zValue(cols: Seq[(Column, (Double, Double))], bits: Int = 16): Column = {
    require(cols.nonEmpty, "at least one column required")
    require(cols.size * bits <= 63, s"${cols.size} dims x $bits bits exceeds a long")
    val maxBucket = (1L << bits) - 1
    val dims = cols.map { case (c, (lo, hi)) =>
      val span = if (hi > lo) hi - lo else 1.0
      least(lit(maxBucket), greatest(lit(0L),
        ((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(span) * lit(maxBucket.toDouble))
          .cast("long"))).cast("int")
    }
    LayoutKernelFunctions.interleaveBits(array(dims: _*), bits)
  }

  /** Write `df` Z-ordered on `cols`: bucketize each column by its actual
    * min/max (one aggregation job), range-partition by the Morton z-value
    * into `numFiles` partitions, sort within each, and write. Files then
    * cover small hyper-rectangles of the `cols` space, so parquet row-group
    * min/max statistics prune multi-column range queries that a single-
    * column sort can only prune on its leading column. One shuffle
    * (the range partitioner's), same as any global sort. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(cols.nonEmpty && numFiles >= 1)
    val mm = df.select(cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__lo_$c"),
        max(col(c).cast("double")).as(s"__hi_$c"))): _*).head()
    val ranges = cols.zipWithIndex.map { case (c, i) =>
      val lo = if (mm.isNullAt(2 * i)) 0.0 else mm.getDouble(2 * i)
      val hi = if (mm.isNullAt(2 * i + 1)) 0.0 else mm.getDouble(2 * i + 1)
      col(c) -> (lo, hi)
    }
    df.withColumn("__z", zValue(ranges, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a parquet directory into ~`targetBytes` files: count the
    * input bytes from the file listing (no data read), then rewrite
    * through `coalesce` — a NARROW dependency, no shuffle; output file
    * sizes track input totals because parquet re-encodes at similar
    * ratios. Set `rebalance = true` to use a full `repartition` shuffle
    * instead when the inputs are pathologically skewed and even output
    * sizes matter more than the shuffle. The standard hygiene pass after
    * streaming/incremental ingestion, where thousands of KB-sized files
    * otherwise dominate open/footer costs and planner listing time. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024, rebalance: Boolean = false): Int = {
    require(targetBytes > 0)
    // one recursive listFiles streams every file length in a single
    // namenode/object-store scan (a per-file getFileStatus loop would
    // issue thousands of RPCs in exactly the many-tiny-files scenario
    // this method exists for). Recursive, not listStatus: a partitioned
    // table's top level holds only subdirectories, and a non-recursive
    // sum would read ~0 bytes and collapse the whole dataset to one file.
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(inDir)
    val fs = dir.getFileSystem(conf)
    var totalBytes = 0L
    var nFiles = 0
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        totalBytes += st.getLen
        nFiles += 1
      }
    }
    require(nFiles > 0, s"no data files under $inDir — nothing to compact")
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes.toDouble).toInt)
    val df = spark.read.parquet(inDir)
    val sized = if (rebalance) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outDir)
    n
  }

  /** Hive-style partitioned layout: directory-per-value of
    * `partitionCols` so a reader filtering on them PRUNES whole
    * directories from the listing — the zero-IO complement of
    * [[writeZOrdered]] (z-order skips row groups WITHIN files via
    * min/max stats; partitioning skips files via paths; low-cardinality
    * routing columns like source/date/lang belong in the partitioning,
    * high-cardinality range columns in the z-order). Pre-shuffles on the
    * partition columns so each directory gets ONE writer's files instead
    * of (input partitions × values) fragments — the small-files failure
    * that makes naive partitionBy writes unusable at scale. Cardinality
    * is the caller's contract: partitioning on a near-unique column
    * creates a directory per row (`maxPartitions` guards it). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxPartitions: Long = 10000): Unit = {
    require(partitionCols.nonEmpty, "at least one partition column required")
    val card = df.select(partitionCols.map(col): _*).distinct().count()
    require(card <= maxPartitions,
      s"$card distinct partition values exceed maxPartitions $maxPartitions")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}

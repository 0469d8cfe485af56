package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.ParquetIO

/** Index-column operations: global sort, reindex, dedup, alignment validation
  * (SURVEY §2.3 J1/J4, §2.4 A4, §2.6 O1).
  *
  * Reference: /root/reference/parq_tools/utils/index_utils.py.
  */
object IndexOps {

  /** Global multi-column ascending sort (reference sort_parquet_file,
    * index_utils.py:62-102). Spark range-partitions on the sort keys and
    * external-sorts each partition with spill — strictly better at scale than
    * the reference's concat-everything-then-sort-in-memory merge. */
  def sort(df: DataFrame, columns: Seq[String]): DataFrame =
    df.orderBy(columns.map(col): _*)

  def sortFile(spark: SparkSession, input: String, output: String,
      columns: Seq[String], singleFile: Boolean = false): Unit = {
    val out = sort(ParquetIO.read(spark, input), columns)
    if (singleFile) ParquetIO.writeSingleFile(out, output) else ParquetIO.write(out, output)
  }

  /** Reindex = left outer join of the new index against the data, with typed
    * null-fill, then sort (reference reindex_parquet, index_utils.py:105-164).
    * Join keys = intersection of the new index's columns and the data's
    * columns (index_utils.py:121). Fill semantics (index_utils.py:139-151):
    * float/double → NaN; everything else keeps SQL null.
    *
    * NOTE: a single global join, not the reference's per-chunk join — the
    * per-chunk version duplicates unmatched index rows once per chunk, a bug
    * we deliberately do not replicate (SURVEY §7.4 hard part 6). */
  def reindex(
      newIndex: DataFrame,
      data: DataFrame,
      sortAfterReindex: Boolean = true): DataFrame = {
    val keys = newIndex.columns.filter(data.columns.contains).toSeq
    if (keys.isEmpty)
      throw new IllegalArgumentException(
        "new index shares no columns with the data schema")
    val joined = newIndex.join(data, keys, "left")
    val filled = data.schema.fields.filterNot(f => keys.contains(f.name))
      .foldLeft(joined) { (df, f) =>
        f.dataType match {
          case DoubleType => df.withColumn(f.name, coalesce(col(f.name), lit(Double.NaN)))
          case FloatType  => df.withColumn(f.name, coalesce(col(f.name), lit(Float.NaN)))
          case _          => df // ints/strings/etc. keep SQL null
        }
      }
    if (sortAfterReindex) filled.orderBy(keys.map(col): _*) else filled
  }

  /** First-occurrence-wins dedup on the index columns (reference
    * dedup_index_parquet, index_utils.py:167-205 — a driver-side seen-set;
    * here a distributed window). "First" needs a stable order: callers pass
    * an explicit `orderColumns`; if empty we fall back to
    * `monotonically_increasing_id` over the scan, which follows file/row-group
    * order for a single input file. */
  def dedupFirstWins(
      df: DataFrame,
      indexColumns: Seq[String],
      orderColumns: Seq[String] = Nil): DataFrame = {
    val ord = "__graft_ord"
    val withOrd =
      if (orderColumns.nonEmpty) df.withColumn(ord, struct(orderColumns.map(col): _*))
      else df.withColumn(ord, monotonically_increasing_id())
    val w = Window.partitionBy(indexColumns.map(col): _*).orderBy(col(ord))
    withOrd.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop(ord, "__graft_rn")
  }

  /** Stable 1-based global row numbers in `orderColumns` order WITHOUT the
    * single-partition bottleneck: `row_number() OVER (ORDER BY …)` forces
    * every row through ONE task (Spark plans a global window as a
    * single-partition exchange), which is the canonical 100 TB stall. This
    * instead range-partitions and locally sorts (Spark's scalable global
    * sort shape), tags each row with its partition id and a
    * partition-local ordinal, prefix-sums the per-partition counts on the
    * driver (|partitions| longs) and broadcast-joins the offsets back —
    * the classic two-phase numbering, kept ENTIRELY inside the DataFrame
    * engine (whole-stage codegen end to end; the old `rdd.zipWithIndex`
    * version left codegen, re-materialized the sort and scheduled an
    * extra count job).
    *
    * The local ordinal is `_mid − min(_mid)` per partition, where `__g_mid`
    * is `monotonically_increasing_id()` evaluated in the sorted row flow.
    * That relies on the id being CONSECUTIVE within a partition —
    * Spark's documented layout (partition id in the upper 31 bits, the
    * per-partition record number in the lower 33,
    * `MonotonicallyIncreasingID` expression doc), stable since 1.6; the
    * min-subtraction keeps us independent of the base-offset layout
    * itself. The localCheckpoint freezes the nondeterministic ids so the
    * offsets job and the main job see the same assignment (same
    * materialize-once contract as [[graft.operators.Components]]).
    * Deterministic iff `orderColumns` is a total order (ties get an
    * arbitrary but valid numbering within their run).
    */
  def stableRowNumber(df: DataFrame, orderColumns: Seq[String],
      outCol: String = "row_num"): DataFrame = {
    require(orderColumns.nonEmpty, "stableRowNumber needs ordering columns")
    val orderCols = orderColumns.map(col)
    val base = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .select(col("*"), spark_partition_id().as("__g_pid"),
        monotonically_increasing_id().as("__g_mid"))
      .localCheckpoint()
    val stats = base.groupBy("__g_pid")
      .agg(count(lit(1)).as("_c"), min("__g_mid").as("__g_m0"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // exclusive prefix: offset of partition i = row counts of partitions < i
    val scan = stats.scanLeft((0, 0L)) { case ((_, c), (pid, n, _)) => (pid, c + n) }
    val offsets = scan.init.zip(stats).map {
      case ((_, off), (pid, _, m0)) => (pid, off, m0)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__g_pid", "__g_off", "__g_m0")
    base.join(broadcast(offDf), Seq("__g_pid"))
      .withColumn(outCol, col("__g_mid") - col("__g_m0") + lit(1L) + col("__g_off"))
      .select(df.columns.map(col) :+ col(outCol): _*)
  }

  /** Validate that all datasets have identical index-column content
    * (reference validate_index_alignment, index_utils.py:15-59). The
    * reference checks batch-by-batch positional equality; inputs are required
    * to be sorted/aligned, so multiset equality is the order-insensitive
    * equivalent. One job per pair: per-key counts full-outer-joined — any
    * null or unequal count row proves misalignment (vs 4 jobs for the naive
    * count + two-sided exceptAll). Throws on first mismatch. */
  def validateIndexAlignment(dfs: Seq[DataFrame], indexColumns: Seq[String]): Unit = {
    require(dfs.nonEmpty)
    val keyCols = indexColumns.map(col)
    val counted = dfs.map(_.groupBy(keyCols: _*).agg(count(lit(1)).as("__n")))
    val first = counted.head
    counted.zipWithIndex.tail.foreach { case (k, i) =>
      val left = first.withColumnRenamed("__n", "__n0")
      val right = indexColumns.foldLeft(k.withColumnRenamed("__n", "__n1")) {
        (df, c) => df.withColumnRenamed(c, s"__r_$c")
      }
      // null-safe key equality: a NULL index value present in both datasets
      // is aligned, not a mismatch
      val cond = indexColumns.map(c => left(c) <=> right(s"__r_$c")).reduce(_ && _)
      val mismatch = left.join(right, cond, "full_outer")
        .filter(col("__n0").isNull || col("__n1").isNull || col("__n0") =!= col("__n1"))
      if (!mismatch.isEmpty)
        throw new IllegalArgumentException(
          s"Index columns (${indexColumns.mkString(", ")}) of dataset $i are not aligned with dataset 0")
    }
  }
}

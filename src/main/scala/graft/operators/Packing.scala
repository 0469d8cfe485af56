package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines (north-star extension):
  * documents are conceptually concatenated in a deterministic order and
  * chopped into fixed-size token windows; each document is assigned the
  * window its first token lands in. The output is the standard "streaming
  * packing" layout used to build fixed-length training sequences.
  *
  * The core primitive is a distributed EXCLUSIVE PREFIX SUM over the
  * ordering column. The naive formulation — `sum(size) OVER (ORDER BY id)`
  * with no partition — executes as a single-partition window: one task sorts
  * and scans the entire corpus, which is exactly the bottleneck that cannot
  * exist at 100 TB. Instead the sum is computed hierarchically:
  *
  *   1. rows group into blocks (`floor(id / blockSize)`); per-block totals
  *      aggregate map-side (tiny result: one row per block);
  *   2. block offsets = exclusive cumsum over the BLOCK table only — the one
  *      single-partition window runs over ~rows/blockSize rows, not rows;
  *   3. block offsets broadcast-join back; within-block exclusive cumsum
  *      runs as a per-block window, parallel across blocks.
  *
  * Every stage is either map-side, a window over a tiny table, or a window
  * partitioned by block — nothing global touches the full data. */
object Packing {

  /** Adds `start_offset` (exclusive prefix sum of `sizeCol` in `idCol`
    * order) and `pack_id` (`start_offset / budget`, integer division) to
    * `df`. Deterministic: a pure function of (id, size) pairs, invariant to
    * partitioning and to `blockSize`.
    *
    * `idCol` must be numeric and unique (a document id); `blockSize` trades
    * the size of the driver-adjacent block table (rows/blockSize entries)
    * against per-block window parallelism. */
  def packByBudget(df: DataFrame, idCol: String, sizeCol: String,
      budget: Long, blockSize: Long = 1L << 20): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")

    def blockOf(c: Column): Column = floor(c / blockSize).cast("long")
    val size = col(sizeCol).cast("long")

    // (2) exclusive cumsum over the block table — tiny by construction
    val blockTotals = df
      .groupBy(blockOf(col(idCol)).as("__blk"))
      .agg(sum(size).as("__blk_sum"))
    val blockW = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = blockTotals
      .withColumn("__blk_off", coalesce(sum(col("__blk_sum")).over(blockW), lit(0L)))
      .drop("__blk_sum")

    // (3) within-block exclusive cumsum, offset by the block's start
    val localW = Window.partitionBy(col("__blk")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__blk", blockOf(col(idCol)))
      .join(broadcast(blockOffsets), Seq("__blk"))
      .withColumn("start_offset",
        col("__blk_off") + coalesce(sum(size).over(localW), lit(0L)))
      .withColumn("pack_id", floor(col("start_offset") / budget).cast("long"))
      .drop("__blk", "__blk_off")
  }

  /** Packing efficiency report over [[packByBudget]] output: one row per
    * pack — (pack_id, n_docs, total_size, fill) with `fill = total_size /
    * budget`. The diagnostic that tells you whether the budget is sized to
    * the document distribution (fill ≪ 1 wastes sequence positions; packs
    * over 1 exist by construction — a document whose start lands inside a
    * pack spills past its end, offset packing never splits documents).
    * One map-side-combined aggregation keyed on pack_id; output height =
    * corpus size / budget. */
  def packingStats(packed: DataFrame, sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(packed.columns.contains("pack_id"),
      "input must carry pack_id (packByBudget output)")
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("total_size"))
      .withColumn("fill", col("total_size").cast("double") / budget)
  }

  /** Split long documents into fixed-width token chunks with overlap —
    * the preprocessing step BEFORE packing when documents exceed the
    * training sequence length. Chunks are `maxTokens` tokens starting
    * every `maxTokens − overlapTokens` tokens, short tail included, so
    * every token appears in at least one chunk and consecutive chunks
    * share `overlapTokens` tokens of context. Output: one row per chunk —
    * (id, chunk_index, chunk_text, n_chunk_tokens); blank docs produce no
    * rows.
    *
    * Plan shape: a compiled kernel projection + posexplode inside the scan
    * stage — zero shuffles at any corpus size (the row-count multiplier is
    * ≈ doc_tokens / stride, the chunking contract itself). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(overlapTokens >= 0 && overlapTokens < maxTokens,
      s"overlap must be in [0, maxTokens): overlap=$overlapTokens max=$maxTokens")
    val stride = maxTokens - overlapTokens
    df.select(col(idCol).as("id"),
      posexplode(graft.functions.kernels.TextKernelFunctions.tokenChunks(
        col(textCol), maxTokens, stride)).as(Seq("chunk_index", "chunk_text")))
      .withColumn("n_chunk_tokens",
        size(split(col("chunk_text"), " ")))
  }
}

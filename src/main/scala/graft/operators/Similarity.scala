package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.kernels.VectorKernelFunctions

/** Approximate-nearest-neighbor search over an embedding column (north-star
  * extensions, SURVEY §7.2 step 10).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one scan, no shuffle of the corpus, a final
  *    per-query top-k. The correctness baseline, and the right choice
  *    whenever |queries| is small.
  *  - [[lshTopK]] — sign-projection LSH bucketing: corpus is bucketed once
  *    (can be precomputed and written as a bucketed table), queries probe
  *    only their buckets, exact cosine re-ranks the candidates. The 100 TB
  *    path: candidate set per query is ~corpus/2^bitsPerBand · numBands.
  *
  * Cosine runs as a compiled Catalyst kernel
  * ([[VectorKernelFunctions.cosineSimilarity]]) — the interpreted
  * `zip_with`/`aggregate` form costs ~100× more per pair and dominates the
  * scan otherwise.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector. Queries must be small
    * enough to broadcast (they are, by construction: a query batch).
    * Output: (query id, neighbor id, cosine, rank). */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nbr_id"), col(corpusVec).as("nbr_vec"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("nbr_id"),
        VectorKernelFunctions.cosineSimilarity(col("query_vec"), col("nbr_vec")).as("cosine"))
    // rank within query: top-k per group (window after a single shuffle on
    // query_id; AQE coalesces the tiny post-shuffle partitions)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates share at least one band bucket with the
    * query, re-ranked by exact cosine. Recall is tuned by
    * (numBits, numBands): more bands → more probes → higher recall. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int,
      numBits: Int = 32, numBands: Int = 8, seed: Long = 42L): DataFrame = {
    require(numBits % numBands == 0, "numBits must divide into numBands evenly")
    val bitsPerBand = numBits / numBands
    // band on ids only — vectors are dropped before any shuffle, so the
    // bucket join and the candidate distinct move 16-byte rows, never the
    // embedding payload (same shape as Dedup.embeddingNearDup)
    def banded(df: DataFrame, id: String, vec: String, idAs: String) =
      df.select(col(id).as(idAs),
        VectorKernelFunctions.signBits(col(vec), dim, numBits, seed).as("__bits"))
        .select(col(idAs),
          posexplode(VectorFunctions.bandBuckets(col("__bits"), numBands, bitsPerBand))
            .as(Seq("band", "bucket")))

    val c = banded(corpus, corpusId, corpusVec, "nbr_id")
    val q = banded(queries, queryId, queryVec, "query_id")
    val candidates = c.join(broadcast(q), Seq("band", "bucket"))
      .select("query_id", "nbr_id").distinct()
    // vectors rejoin only for surviving candidate pairs: the candidate set
    // is small (|queries| × bucket occupancy), so it broadcasts into the
    // corpus scan — the corpus is never shuffled
    val cv = corpus.select(col(corpusId).as("nbr_id"), col(corpusVec).as("nbr_vec"))
    val qv = queries.select(col(queryId).as("query_id"), col(queryVec).as("query_vec"))
    val scored = cv.join(broadcast(candidates), Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        VectorKernelFunctions.cosineSimilarity(col("query_vec"), col("nbr_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

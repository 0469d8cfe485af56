package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.kernels.TextKernelFunctions

/** Corpus-wide frequency statistics — the diagnostics that FEED the dedup
  * and filtering passes: the top boilerplate n-grams tell you what
  * `maxDocFreq` cap to run [[Dedup.ngramJaccard]] with, which lines
  * [[Dedup.dedupLines]] will strike, and what repeated content inflates a
  * source before training.
  */
object CorpusStats {

  /** Top-k word n-grams by corpus occurrence count:
    * (ngram, total_count, doc_freq), ordered by total_count descending with
    * the n-gram string as the deterministic tiebreak.
    *
    * Plan shape: compiled shingle-strings kernel → explode → one hash
    * aggregation → `TakeOrderedAndProject` (per-partition top-k heaps, a
    * k-row driver merge — never a global sort). The aggregation shuffles
    * n-gram STRINGS — unavoidable when the caller wants the text back —
    * but map-side partial aggregation collapses each partition's duplicates
    * first, so shuffle volume is bounded by distinct-grams-per-partition,
    * not corpus token count. doc_freq rides the same aggregate as a
    * two-phase distinct count. */
  def topNgrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    df.select(col(idCol).as("id"),
      explode(TextKernelFunctions.shingleStrings(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("total_count"),
        count_distinct(col("id")).as("doc_freq"))
      .orderBy(col("total_count").desc, col("ngram"))
      .limit(k)
  }

  /** Document-frequency histogram of distinct word n-gram shingles:
    * (doc_freq, n_shingles) — how many distinct shingles appear in exactly
    * `doc_freq` documents. THE diagnostic for choosing
    * [[Dedup.ngramJaccard]]'s `maxDocFreq` cap: the join cost it bounds is
    * Σ doc_freq² · n_shingles over this table, so the histogram's tail IS
    * the blowup. Two hash aggregations over 8-byte shingle hashes (both
    * map-side combined); output height = max doc_freq, a driver-safe
    * handful of rows. */
  def shingleDfHistogram(
      df: DataFrame,
      textCol: String,
      shingleSize: Int = 3): DataFrame =
    df.select(explode(
      TextKernelFunctions.shingleHashSet(col(textCol), shingleSize)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("doc_freq"))
      .groupBy(col("doc_freq")).agg(count(lit(1)).as("n_shingles"))
      .orderBy(col("doc_freq"))
}

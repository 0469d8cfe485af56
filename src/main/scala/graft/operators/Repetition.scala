package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.kernels.TextKernelFunctions

/** Intra-document repetition signals and repairs for corpus quality
  * filtering — the Gopher/MassiveText-style repetition rules (Rae et al.
  * 2021, "Scaling Language Models", table A1) and the CCNet-style
  * duplicate-line removal, re-expressed as pure column algebra.
  *
  * Scale design: every metric here is a per-row function of the text —
  * a projection inside the scan stage, no explode, no shuffle, no UDF.
  * The one metric that naively needs a per-doc `group by n-gram`
  * (top-n-gram share) runs as a compiled kernel over the doc's shingle-hash
  * array instead ([[TextKernelFunctions.topFreqShare]]: sort + run-length
  * scan per row), so a 100 TB corpus scores in one pass with zero wide
  * stages.
  */
object Repetition {

  /** Text with duplicate lines removed, keeping the FIRST occurrence in
    * order (`array_distinct` is documented order-preserving) — the standard
    * boilerplate-line repair. */
  def dedupLines(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  /** Fraction of lines that are duplicates of an earlier line (0.0 for
    * empty or single-line text). */
  def dupLineFrac(text: Column): Column = {
    val l = split(text, "\n")
    when(size(l) <= 1, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(l)).cast("double") / size(l).cast("double"))
  }

  /** Fraction of characters removed by [[dedupLines]] (separator chars of
    * removed lines included; 0.0 for empty text). */
  def dupLineCharFrac(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(dedupLines(text))).cast("double") /
        length(text).cast("double"))

  /** Type-token ratio: distinct tokens / tokens (0.0 for blank text).
    * Low TTR = heavy word repetition. */
  def typeTokenRatio(text: Column): Column = {
    val ts = TextFunctions.tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(array_distinct(ts)).cast("double") / size(ts).cast("double"))
  }

  /** Fraction of word n-gram occurrences that are repeats of an n-gram
    * already seen in the document (0.0 when the text has < n tokens). */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val all = TextKernelFunctions.shingleHashes(text, n)
    when(size(all) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(all)).cast("double") /
        size(all).cast("double"))
  }

  /** Share of the document's n-gram occurrences taken by its single most
    * frequent n-gram (the Gopher "top n-gram fraction"; 0.0 when the text
    * has < n tokens). Compiled kernel — no explode, no shuffle. */
  def topNgramShare(text: Column, n: Int): Column =
    TextKernelFunctions.topFreqShare(TextKernelFunctions.shingleHashes(text, n))

  /** Per-document repetition scorecard:
    * `(id, n_tokens, type_token_ratio, dup_ngram_frac, top_ngram_share)`.
    * One projection over the corpus — the shingle-hash array is computed
    * once and shared by both n-gram metrics. */
  def stats(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sh = TextKernelFunctions.shingleHashes(col(textCol), n)
    df.select(
        col(idCol).as("id"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        typeTokenRatio(col(textCol)).as("type_token_ratio"),
        sh.as("__sh"))
      .select(
        col("id"), col("n_tokens"), col("type_token_ratio"),
        when(size(col("__sh")) === 0, lit(0.0))
          .otherwise(lit(1.0) - size(array_distinct(col("__sh"))).cast("double") /
            size(col("__sh")).cast("double"))
          .as("dup_ngram_frac"),
        TextKernelFunctions.topFreqShare(col("__sh")).as("top_ngram_share"))
  }

  /** Filter: drop documents exceeding any repetition bound — the
    * MassiveText-style quality gate. */
  def filterRepetitive(df: DataFrame, textCol: String, n: Int = 3,
      maxDupNgramFrac: Double = 0.3, maxTopNgramShare: Double = 0.2,
      minTypeTokenRatio: Double = 0.0): DataFrame =
    df.filter(dupNgramFrac(col(textCol), n) <= maxDupNgramFrac &&
      topNgramShare(col(textCol), n) <= maxTopNgramShare &&
      typeTokenRatio(col(textCol)) >= minTypeTokenRatio)
}

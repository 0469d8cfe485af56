package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document-curation rule panels — the published heuristic filters a
  * web-scale pretraining pipeline applies BEFORE any model-based scoring:
  * the Gopher/MassiveText quality rules (Rae et al. 2021, Table A1) and
  * the C4 line/document filters (Raffel et al. 2020, §2.2). (North-star
  * extensions; [[Repetition]] carries the companion repetition rules and
  * `TextFunctions.qualityScore` the soft composite — this panel is the
  * hard-threshold, per-rule-auditable variant reviewers actually read.)
  *
  * Every rule is a codegen'd column expression (regex char classes +
  * higher-order array functions, no UDFs), chosen so the SAME counting
  * conventions replay in oracle SQL: words = `\s+` tokens of the trimmed
  * lowered text, lines = `\n` splits, ellipsis = `…` or literal `...`.
  *
  * Scale: pure per-row projections — no shuffle, no window, prunes to
  * (id, text) at the scan.
  */
object Curation {

  private val gopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher quality flags. One row per input doc:
    * the measured signals (`n_words`, `mean_word_len`, `symbol_ratio`,
    * `bullet_frac`, `ellipsis_frac`, `alpha_word_frac`,
    * `stopword_hits`) plus one boolean per rule and the conjunction
    * `pass`. Thresholds default to the published MassiveText values.
    * Line fractions count ALL `\n` lines (blank lines count in the
    * denominator and satisfy neither pattern). */
  def gopherQualityFlags(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWord: Double = 3.0, maxMeanWord: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2): DataFrame = {
    val text = col(textCol)
    val toks = TextFunctions.tokens(text)
    val nWords = size(toks)
    val wordsOr1 = greatest(nWords, lit(1)).cast("double")
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEll = (length(text) - length(replace(text, lit("…"), lit("")))) +
      (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val lines = split(text, "\n")
    val nLines = size(lines)
    val linesOr1 = greatest(nLines, lit(1)).cast("double")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•‣▪]")))
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
    val alphaWords = size(filter(toks, t => t.rlike("\\p{L}")))
    val stopHits = size(array_intersect(toks,
      array(gopherStopwords.map(lit): _*)))
    docs.select(
        col(idCol),
        nWords.as("n_words"),
        TextFunctions.meanTokenLength(text).as("mean_word_len"),
        (nHash + nEll).cast("double").divide(wordsOr1).as("symbol_ratio"),
        bulletLines.cast("double").divide(linesOr1).as("bullet_frac"),
        ellipsisLines.cast("double").divide(linesOr1).as("ellipsis_frac"),
        alphaWords.cast("double").divide(wordsOr1).as("alpha_word_frac"),
        stopHits.as("stopword_hits"))
      .withColumn("pass_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_mean_word",
        col("mean_word_len") >= minMeanWord && col("mean_word_len") <= maxMeanWord)
      .withColumn("pass_symbol", col("symbol_ratio") < maxSymbolRatio)
      .withColumn("pass_bullet", col("bullet_frac") < maxBulletFrac)
      .withColumn("pass_ellipsis", col("ellipsis_frac") < maxEllipsisFrac)
      .withColumn("pass_alpha", col("alpha_word_frac") > minAlphaWordFrac)
      .withColumn("pass_stopwords", col("stopword_hits") >= minStopwordHits)
      .withColumn("pass",
        col("pass_words") && col("pass_mean_word") && col("pass_symbol") &&
          col("pass_bullet") && col("pass_ellipsis") && col("pass_alpha") &&
          col("pass_stopwords"))
  }

  /** C4-style cleaning: keep only lines that end in terminal punctuation
    * (`.`, `!`, `?`, `"`, `”`), carry at least `minLineWords` words and
    * do not mention "javascript"; DROP the whole document when it
    * contains "lorem ipsum" or a `{` (the code/boilerplate tells), or
    * when no line survives. Output: one row per SURVIVING doc —
    * `(id, n_lines, n_kept, text_clean)` with the kept lines re-joined
    * by `\n`. Matching is case-insensitive via the lowered text, like
    * the reference pipeline. */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5): DataFrame = {
    val low = lower(col(textCol))
    val lines = split(low, "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"”]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !l.contains("javascript"))
    docs
      .filter(col(textCol).isNotNull &&
        !low.contains("lorem ipsum") && !low.contains("{"))
      .select(col(idCol), size(lines).as("n_lines"),
        size(kept).as("n_kept"),
        array_join(kept, "\n").as("text_clean"))
      .filter(col("n_kept") > 0)
  }
}

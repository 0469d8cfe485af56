package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines (north-star
  * extensions beyond the reference surface — SURVEY §7.2 step 10).
  *
  * Everything here is built from `org.apache.spark.sql.functions._` only
  * (codegen'd, whole-stage-compatible, no UDFs): at 100 TB these run inside
  * the scan stage with zero shuffle.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed, lowercased text; empty array for blank
    * text. After `trim`, `split` on `\s+` can never produce empty tokens, so
    * no `filter` lambda is needed — keeping the whole expression inside
    * whole-stage codegen (ArrayFilter falls back to interpreted eval and
    * measured ~10× slower). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Number of whitespace-separated tokens (0 for blank text). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: whitespace tokens further split on
    * letter/digit/punctuation boundaries — a cheap, deterministic proxy for
    * tokenizer cost without shipping a vocab. Compiled kernel: the
    * declarative `size(filter(split(…lookaround regex…)))` form runs its
    * ArrayFilter lambda interpreted (measured 4.1× slower at sf0.1). */
  def subwordCount(text: Column): Column =
    graft.functions.kernels.TextKernelFunctions.subwordCount(text)

  /** Sentence count under the ASCII contract (segments split on `[.!?]+`
    * runs that contain an alphanumeric) — compiled single-scan kernel;
    * the relational split-then-filter form would run its lambda
    * interpreted. Basis for words-per-sentence and readability scores. */
  def sentenceCount(text: Column): Column =
    graft.functions.kernels.TextKernelFunctions.sentenceCount(text)

  /** Flesch-style reading-ease estimate:
    * `206.835 − 1.015·(words/sentences) − 84.6·(vowelGroups/words)` with
    * `[aeiouy]+` runs as the syllable proxy — the standard cheap
    * readability signal for corpus quality gates. NULL when the text has
    * no sentence or no word (the formula is undefined, not zero). */
  def readingEase(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sents = sentenceCount(text).cast("double")
    val vg = regexp_count(lower(text), lit("[aeiouy]+")).cast("double")
    when(sents > 0 && words > 0,
      lit(206.835) - lit(1.015) * (words / sents) - lit(84.6) * (vg / words))
  }

  /** Word n-gram shingles joined by single spaces (basis for MinHash /
    * Jaccard dedup). Returns an empty array when there are fewer than `n`
    * tokens. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(ts) - lit(n)),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** Distinct shingle set (order-insensitive). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** 64-bit document fingerprint: xxhash64 of the token-normalized text
    * (whitespace squashed, lowercased) — robust to formatting-only changes. */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(text)))

  /** Rolling n-gram fingerprints: one 64-bit hash per shingle, in document
    * order. Winnowing-style selection = `array_min` over a window of these.
    * Delegates to the compiled shingle-hash kernel — the declarative
    * `transform(shingles(…), xxhash64)` form costs O(tokens²) interpreted
    * string copies per row. */
  def ngramFingerprints(text: Column, n: Int): Column =
    graft.functions.kernels.TextKernelFunctions.shingleHashes(text, n)

  /** Cross-engine document fingerprint: md5 hex of the token-normalized
    * text. Same value from any SQL engine with md5 — the reproducible
    * (oracle-checkable) sibling of the xxhash64 [[fingerprint]]. */
  def md5Fingerprint(text: Column): Column =
    md5(encode(concat_ws(" ", tokens(text)), "UTF-8"))

  /** Minimum md5 over word n-gram shingles — a bottom-1 MinHash sketch with
    * a cross-engine hash; null when the document has fewer than `n` tokens.
    * Compiled kernel: the declarative
    * `array_min(transform(shingles(t, n), md5))` form runs its lambdas
    * interpreted at O(tokens²) string copies per row (measured 14 s vs
    * ~1 s for q28 at sf0.1). */
  def minShingleMd5(text: Column, n: Int): Column =
    graft.functions.kernels.TextKernelFunctions.minShingleMd5(text, n)

  // Small public stopword lists per language for the lang-id heuristic.
  // private[graft]: SparkEntry interpolates these into the q27 DuckDB oracle
  // so query and oracle can never drift.
  private[graft] val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
      "for", "on", "with", "as", "was", "are", "be", "this", "at", "by"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ich", "zu", "den",
      "mit", "von", "auf", "für", "ein", "eine", "im", "dem", "sich", "des", "er"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "pas", "que",
      "pour", "dans", "qui", "sur", "avec", "au", "du", "des", "ce", "il"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
      "es", "no", "por", "con", "para", "del", "se", "su", "al", "lo"))

  /** N-gram/stopword language-ID heuristic: score each language by the share
    * of tokens that are that language's stopwords; emit the argmax, "und"
    * (undetermined) when no stopword hits at all. Pure column expressions —
    * lexicographic `array_max` over (score, lang) structs picks the winner
    * deterministically (ties → lexicographically larger code). */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(ts, array(words.map(lit): _*))).cast("double") /
          greatest(size(ts), lit(1)).cast("double"),
        lit(lang))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("col1") > 0.0, best.getField("col2")).otherwise(lit("und"))
  }

  /** Ratio of punctuation characters to all characters (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val total = greatest(length(text), lit(1)).cast("double")
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / total
  }

  /** Ratio of alphabetic characters to all characters. */
  def alphaRatio(text: Column): Column = {
    val total = greatest(length(text), lit(1)).cast("double")
    length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") / total
  }

  /** Ratio of tokens that are (any-language) stopwords — a fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val all = stopwords.values.flatten.toSeq.distinct.sorted
    size(array_intersect(ts, array(all.map(lit): _*))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Mean token length in characters (0 for blank text). */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: documents with reasonable length,
    * low punctuation noise, high alphabetic share and some stopword glue
    * score high. Deterministic, documented weights. */
  def qualityScore(text: Column): Column = {
    val lengthSignal = least(tokenCount(text).cast("double") / lit(20.0), lit(1.0))
    val punctSignal = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    val alphaSignal = alphaRatio(text)
    val stopSignal = least(stopwordRatio(text) * 3.0, lit(1.0))
    round(lengthSignal * 0.25 + punctSignal * 0.25 + alphaSignal * 0.25 + stopSignal * 0.25, 6)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.kernels.TextKernelFunctions

/** Corpus text cleaning: PII redaction, Unicode normalization and
  * whitespace repair — the standard pre-tokenization hygiene passes of
  * public corpus pipelines (the C4 paper's cleaning rules, RefinedWeb's
  * pipeline description). Everything is a per-row projection: regex
  * replacements are codegen'd `regexp_replace` chains, NFC normalization
  * is a compiled kernel over `java.text.Normalizer` — no UDFs, no
  * shuffles, scan-stage cost only.
  *
  * The regex patterns deliberately avoid lookaround/backreferences so
  * they behave identically under Java regex and RE2 (DuckDB/Go) — which
  * is what makes the operators exactly oracle-checkable cross-engine.
  */
object TextClean {

  /** Redaction patterns, applied IN ORDER (URLs before emails, so an
    * address inside a URL is consumed by the URL rule first). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\+\\d{7,15}\\b" -> "<PHONE>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>")

  /** Replace emails, URLs, IPv4 addresses and phone numbers with typed
    * placeholder tokens. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pattern, token)) =>
      regexp_replace(c, pattern, token)
    }

  /** Unicode NFC normalization (compiled kernel; canonical composition —
    * é as e+combining-accent becomes the single codepoint, so dedup and
    * fingerprinting see one representation). */
  def normalizeNfc(text: Column): Column = TextKernelFunctions.nfcNormalize(text)

  /** Squash runs of whitespace (including newlines/tabs) to single spaces
    * and trim. */
  def squashWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The full hygiene pass: NFC → PII redaction → whitespace squash. */
  def clean(text: Column): Column =
    squashWhitespace(redactPii(normalizeNfc(text)))
}

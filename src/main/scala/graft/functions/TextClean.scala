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

  /** Whitespace spelled as an explicit character class. Java's `\s` is
    * `[ \t\n\x0B\f\r]` while RE2's (DuckDB/Go) omits `\x0B` — a text
    * containing a vertical tab makes `[^\s]+` consume different spans in
    * the two engines. Spelling the class out keeps the two redaction
    * replays byte-identical. */
  val wsClass: String = " \\t\\n\\x0B\\f\\r"

  /** Redaction patterns, applied IN ORDER (URLs before emails, so an
    * address inside a URL is consumed by the URL rule first). Patterns
    * avoid `\s` (see [[wsClass]]) and lookaround so Java regex and RE2
    * agree exactly; `\b`/`\d` are ASCII-identical in both engines. */
  val piiPatterns: Seq[(String, String)] = Seq(
    s"https?://[^$wsClass]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\+\\d{7,15}\\b" -> "<PHONE>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>")

  /** The oracle-side replay of [[redactPii]]: a nested `regexp_replace`
    * SQL chain over `inner`, generated from [[piiPatterns]] so the Spark
    * chain and the DuckDB oracle can never drift. Patterns contain no
    * single quotes; DuckDB standard strings pass backslashes through
    * untouched, so the literal regex text is identical in both engines. */
  def redactSqlChain(inner: String): String =
    piiPatterns.foldLeft(inner) { case (acc, (pattern, token)) =>
      s"regexp_replace($acc, '$pattern', '$token', 'g')"
    }

  /** Replace emails, URLs, IPv4 addresses and phone numbers with typed
    * placeholder tokens. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pattern, token)) =>
      regexp_replace(c, pattern, token)
    }

  /** Per-document PII DETECTION counts — the reporting side of
    * [[redactPii]] (a corpus publishes its PII rate before deciding to
    * redact, drop, or quarantine). Counts use the same sequential
    * consumption semantics as redaction (a URL swallows the email inside
    * it): the text runs through the replacement chain once and each typed
    * placeholder is counted by split — exact, engine-portable arithmetic
    * (no per-pattern re-scan disagreeing with the chain's precedence).
    * Caveat: literal placeholder tokens already present in the input
    * count as detections — acceptable for corpus text. Output struct:
    * `(n_urls, n_emails, n_ips, n_phones, n_pii)`. */
  def piiCounts(text: Column): Column = {
    val red = redactPii(text)
    def n(token: String): Column =
      size(split(red, java.util.regex.Pattern.quote(token), -1)) - 1
    val (u, e, i, p) = (n("<URL>"), n("<EMAIL>"), n("<IP>"), n("<PHONE>"))
    struct(u.as("n_urls"), e.as("n_emails"), i.as("n_ips"), p.as("n_phones"),
      (u + e + i + p).as("n_pii"))
  }

  /** Unicode NFC normalization (compiled kernel; canonical composition —
    * é as e+combining-accent becomes the single codepoint, so dedup and
    * fingerprinting see one representation). */
  def normalizeNfc(text: Column): Column = TextKernelFunctions.nfcNormalize(text)

  /** Squash runs of whitespace (including newlines/tabs) to single spaces
    * and trim (explicit class — see [[wsClass]]). */
  def squashWhitespace(text: Column): Column =
    trim(regexp_replace(text, s"[$wsClass]+", " "))

  /** The full hygiene pass: NFC → PII redaction → whitespace squash. */
  def clean(text: Column): Column =
    squashWhitespace(redactPii(normalizeNfc(text)))
}

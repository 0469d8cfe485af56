package graft.functions.kernels

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row kernels for text dedup primitives.
  *
  * Spark's higher-order array functions (`transform` / `aggregate` /
  * `filter`) evaluate their lambdas interpreted (CodegenFallback), which
  * makes per-row algorithms like SimHash (64 bit-sums over every token) or
  * MinHash (k minima over every shingle) orders of magnitude slower than a
  * compiled loop — measured 63 ms/row for a column-expression SimHash vs
  * ~10 µs here. These Catalyst expressions keep the relational plan shape
  * (scan → project, no shuffle) but run the inner loop as JVM code.
  *
  * Hashing uses Spark's own XXH64 (the engine behind `xxhash64()`), seed 42.
  */
object TextKernels { // public: generated code references it by name
  val Seed = 42L
  private val Whitespace = Pattern.compile("\\s+")

  /** Lowercased whitespace tokens; empty array for blank text. Lowercasing
    * uses Locale.ROOT to match Spark's locale-independent `lower()` (a
    * tr-TR default locale would otherwise produce dotless-i tokens and
    * machine-dependent dedup results). */
  def tokenize(s: UTF8String): Array[String] = {
    val t = s.toString.trim
    if (t.isEmpty) Array.empty[String]
    else Whitespace.split(t.toLowerCase(java.util.Locale.ROOT))
  }

  def hashToken(t: String): Long = {
    val u = UTF8String.fromString(t)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
  }

  /** Order-dependent combine of token hashes into an n-gram hash
    * (multiply-rotate mix; avoids building the joined shingle string). */
  def combine(acc: Long, h: Long): Long = {
    val x = (acc ^ h) * 0x9e3779b97f4a7c15L
    java.lang.Long.rotateLeft(x, 31) * 0xbf58476d1ce4e5b9L
  }

  /** Hashes of all word n-grams, in order (may contain duplicates). */
  def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val toks = tokenize(s)
    if (toks.length < n) return Array.emptyLongArray
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = hashToken(toks(i)); i += 1 }
    val out = new Array[Long](toks.length - n + 1)
    i = 0
    while (i <= toks.length - n) {
      var acc = Seed
      var j = 0
      while (j < n) { acc = combine(acc, th(i + j)); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  /** All word n-grams as space-joined strings, every `stride` tokens, in
    * order (may contain duplicates) — the string-valued sibling of
    * [[shingleHashes]] for operators that must surface the n-gram text
    * itself (corpus boilerplate mining) or cut text into fixed-width token
    * windows (stride = n). The declarative
    * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))`
    * form runs its lambda interpreted per row (see header). */
  def shingleStrings(s: UTF8String, n: Int, stride: Int): Array[UTF8String] = {
    val toks = tokenize(s)
    if (toks.length < n) return Array.empty[UTF8String]
    val count = (toks.length - n) / stride + 1
    val out = new Array[UTF8String](count)
    var w = 0
    while (w < count) {
      val i = w * stride
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    out
  }

  /** Token chunks for long-document splitting: windows of `size` tokens
    * every `stride` tokens (stride = size − overlap), INCLUDING the short
    * tail — every token lands in at least one chunk (unlike
    * [[shingleStrings]], which emits full windows only). A chunk starts at
    * every k·stride < token count; blank text → no chunks. */
  def tokenChunks(s: UTF8String, size: Int, stride: Int): Array[UTF8String] = {
    val toks = tokenize(s)
    if (toks.length == 0) return Array.empty[UTF8String]
    val count = (toks.length + stride - 1) / stride
    val out = new Array[UTF8String](count)
    var k = 0
    while (k < count) {
      val start = k * stride
      val end = math.min(start + size, toks.length)
      val sb = new java.lang.StringBuilder
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    out
  }

  /** Distinct shingle hashes, sorted ascending (a canonical set). */
  def shingleHashSet(s: UTF8String, n: Int): Array[Long] = {
    val all = shingleHashes(s, n)
    if (all.isEmpty) return all
    java.util.Arrays.sort(all)
    var distinct = 1
    var i = 1
    while (i < all.length) { if (all(i) != all(i - 1)) distinct += 1; i += 1 }
    if (distinct == all.length) return all
    val out = new Array[Long](distinct)
    out(0) = all(0)
    var k = 1
    i = 1
    while (i < all.length) {
      if (all(i) != all(i - 1)) { out(k) = all(i); k += 1 }
      i += 1
    }
    out
  }

  /** MinHash signature from a shingle-hash set: slot i is the minimum of
    * XXH64(h, seed=i) over the set; Long.MaxValue for empty sets. */
  def minhash(hashes: Array[Long], numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var min = Long.MaxValue
      var j = 0
      while (j < hashes.length) {
        val h = XXH64.hashLong(hashes(j), i)
        if (h < min) min = h
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }

  /** Jaro–Winkler similarity (p = 0.1, prefix ≤ 4, boost only above
    * jaro > 0.7 — the classic Winkler parameters) over UTF-16 chars. The
    * exact convention matters for cross-engine replay: transpositions are
    * the INTEGER half of the mismatched-match count (t = mismatches/2
    * truncated — brute-force verified against DuckDB's
    * jaro_winkler_similarity over 4000 random pairs, where the
    * fractional-half variant diverges on ~3% of pairs), both-empty and
    * one-empty return 0, and the match window is max(|s|,|t|)/2 − 1.
    * Char (BMP) semantics — supplementary codepoints compare as
    * surrogate pairs, same as DuckDB's byte-walk on ASCII data. */
  def jaroWinkler(aIn: UTF8String, bIn: UTF8String): Double = {
    val s = aIn.toString; val t = bIn.toString
    val ls = s.length; val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val trans = mismatches / 2 // integer half — the DuckDB convention
    val mD = m.toDouble
    val jaro = (mD / ls + mD / lt + (mD - trans) / mD) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(ls, lt))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + 0.1 * l * (1 - jaro)
  }

  /** Exact Jaccard of two SORTED distinct long arrays (the canonical
    * shingle-hash sets from [[shingleHashSet]]): one merge scan, no
    * allocation — replaces `array_intersect` + `array_union` (two hash-set
    * builds and two result allocations per pair) in dedup verification.
    * 0.0 when both sets are empty (no union → not a duplicate). */
  def sortedJaccard(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la == 0 && lb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (la + lb - inter).toDouble
  }

  /** 64-bit SimHash over the token multiset. */
  def simhash(s: UTF8String): Long = {
    val toks = tokenize(s)
    val sums = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashToken(toks(i))
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) >= 0) out |= (1L << k)
      k += 1
    }
    out
  }

  /** Minimum md5 (lowercase hex) over word n-gram shingles, or null when
    * the text has fewer than `n` tokens. One compiled pass: shingle string
    * built in a reused buffer, digests compared as unsigned bytes (hex is
    * order-preserving, so byte-min == hex-min). The cross-engine
    * (oracle-reproducible) sibling of [[shingleHashes]]. */
  def minShingleMd5(s: UTF8String, n: Int): UTF8String = {
    val toks = tokenize(s)
    if (toks.length < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    var best: Array[Byte] = null
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new java.lang.StringBuilder(32)
    var b = 0
    while (b < best.length) {
      hex.append(Character.forDigit((best(b) >> 4) & 0xf, 16))
      hex.append(Character.forDigit(best(b) & 0xf, 16))
      b += 1
    }
    UTF8String.fromString(hex.toString)
  }

  /** Share of the most frequent element in a long array (max frequency /
    * length; 0.0 for empty). Sorts a private copy, then one run-length
    * scan — the per-row form of `max(count) group by element` with no
    * explode and no shuffle. */
  def topFreqShare(a: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    if (n == 0) return 0.0
    val arr = a.toLongArray()
    java.util.Arrays.sort(arr)
    var best = 1
    var run = 1
    var i = 1
    while (i < n) {
      if (arr(i) == arr(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best.toDouble / n.toDouble
  }

  /** Distinct, sorted hashes of all CHARACTER n-gram windows (raw text,
    * no tokenization/lowercasing — the char-level substring-overlap
    * primitive; windows are UTF-16 code units, identical to SQL
    * `substring` semantics for BMP text). Empty below `n` chars. */
  def charShingleHashSet(s: UTF8String, n: Int): Array[Long] = {
    val str = s.toString
    if (str.length < n) return Array.emptyLongArray
    val all = new Array[Long](str.length - n + 1)
    var i = 0
    while (i <= str.length - n) {
      all(i) = hashToken(str.substring(i, i + n))
      i += 1
    }
    java.util.Arrays.sort(all)
    var distinct = 1
    var k = 1
    while (k < all.length) { if (all(k) != all(k - 1)) distinct += 1; k += 1 }
    if (distinct == all.length) return all
    val out = new Array[Long](distinct)
    out(0) = all(0)
    var w = 1
    k = 1
    while (k < all.length) {
      if (all(k) != all(k - 1)) { out(w) = all(k); w += 1 }
      k += 1
    }
    out
  }

  /** BPE-ish subword count: the number of maximal same-class runs of
    * letters (`\p{L}`) or numbers (`\p{N}`) in the lowercased text — i.e.
    * alnum runs split again at letter↔digit transitions. One compiled
    * codepoint scan, no array materialization; replaces
    * `size(filter(split(lower(text), <lookaround regex>), t => length(t) > 0))`
    * whose ArrayFilter lambda runs interpreted (measured 4.1× on q27).
    * Lowercasing is kept for bit-parity with the declarative form: a few
    * codepoints change category under toLowerCase (e.g. U+0130 İ → i +
    * combining mark), which shifts run boundaries. */
  /** ASCII-contract sentence count: segments delimited by runs of
    * `.`/`!`/`?` count when they contain at least one ASCII alphanumeric
    * character (so "..." or ")!?" fragments don't count). Single scan, no
    * array materialization — mirrors exactly to a relational
    * split-then-filter on `[.!?]+` with a `[A-Za-z0-9]` content test. */
  def sentenceCount(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    var sawContent = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        if (sawContent) count += 1
        sawContent = false
      } else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
          || (c >= '0' && c <= '9')) {
        sawContent = true
      }
      i += 1
    }
    if (sawContent) count += 1
    count
  }

  def subwordCount(s: UTF8String): Int = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var count = 0
    var prev = 0 // 0 = other, 1 = letter, 2 = number
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val cls =
        if (Character.isLetter(cp)) 1
        else {
          val t = Character.getType(cp)
          if (t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
            t == Character.OTHER_NUMBER) 2
          else 0
        }
      if (cls != 0 && cls != prev) count += 1
      prev = cls
      i += Character.charCount(cp)
    }
    count
  }

  /** All character n-grams (multiset, document order) of the
    * ASCII-normalized text: `[A-Za-z]` lowercased, every other character a
    * separator, separator runs collapsed to one space, ends trimmed.
    * Strip-then-lower keeps the contract engine-portable: no non-ASCII
    * codepoint can lower-case its way INTO the alphabet (İ → i̇ would,
    * under lower-first). The char-LM primitive — one scan, one output
    * array, no regex. Empty below `n` normalized chars. */
  def charNgrams(s: UTF8String, n: Int): Array[UTF8String] = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= 'a' && c <= 'z') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
      i += 1
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    val norm = sb.toString
    if (norm.length < n) return Array.empty[UTF8String]
    val out = new Array[UTF8String](norm.length - n + 1)
    var k = 0
    while (k <= norm.length - n) {
      out(k) = UTF8String.fromString(norm.substring(k, k + n))
      k += 1
    }
    out
  }

  /** Unicode NFC normalization. Fast path: pure-ASCII strings (the bulk of
    * English corpora) are already NFC — checked bytewise without decoding. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** array<long> of hashes of all word n-grams (ordered, with duplicates) —
  * the rolling-fingerprint primitive. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.shingleHashes(v.asInstanceOf[UTF8String], n))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.kernels.TextKernels.shingleHashes($c, $n))")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** array<string> of word n-grams every `stride` tokens (ordered, with
  * duplicates) — surfaces the n-gram text itself. */
case class ShingleStringsExpr(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  require(stride >= 1, "stride must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextKernels.shingleStrings(v.asInstanceOf[UTF8String], n, stride)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) " +
        s"graft.functions.kernels.TextKernels.shingleStrings($c, $n, $stride))")
  override protected def withNewChildInternal(c: Expression): ShingleStringsExpr = copy(child = c)
  override def prettyName: String = "shingle_strings"
}

/** array<string> of token chunks (`size` tokens every `stride`, short tail
  * included) — long-document splitting. */
case class TokenChunksExpr(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {
  require(size >= 1, "chunk size must be >= 1")
  require(stride >= 1 && stride <= size,
    s"stride must be in [1, size]: stride=$stride size=$size")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextKernels.tokenChunks(v.asInstanceOf[UTF8String], size, stride)
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) " +
        s"graft.functions.kernels.TextKernels.tokenChunks($c, $size, $stride))")
  override protected def withNewChildInternal(c: Expression): TokenChunksExpr = copy(child = c)
  override def prettyName: String = "token_chunks"
}

/** array<long>: distinct, sorted hashes of word n-grams — the canonical
  * shingle set for Jaccard computations. */
case class ShingleHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.shingleHashSet(v.asInstanceOf[UTF8String], n))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.kernels.TextKernels.shingleHashSet($c, $n))")
  override protected def withNewChildInternal(c: Expression): ShingleHashSetExpr = copy(child = c)
  override def prettyName: String = "shingle_hash_set"
}

/** array<long> MinHash signature of an array<long> shingle-hash set. */
case class MinHashExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    new GenericArrayData(TextKernels.minhash(arr, numHashes))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.kernels.TextKernels.minhash($c.toLongArray(), $numHashes))")
  override protected def withNewChildInternal(c: Expression): MinHashExpr = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash of a text column's token multiset. Generates code (a call
  * into the compiled kernel) so it doesn't split whole-stage-codegen spans. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextKernels.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.TextKernels.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Minimum md5 hex over word n-gram shingles (null below `n` tokens) — the
  * compiled form of `array_min(transform(shingles(t, n), md5))`, whose
  * interpreted lambdas cost O(tokens²) string copies per row. */
case class MinShingleMd5Expr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextKernels.minShingleMd5(v.asInstanceOf[UTF8String], n)
  // result may be null (fewer than n tokens) even for a non-null child, so
  // the generated code re-checks ev.isNull after the kernel call
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.kernels.TextKernels.minShingleMd5($c, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): MinShingleMd5Expr = copy(child = c)
  override def prettyName: String = "min_shingle_md5"
}

/** Jaro–Winkler similarity of two strings (DuckDB-convention constants —
  * see [[TextKernels.jaroWinkler]]). Generates code (a call into the
  * compiled kernel) so it stays inside whole-stage codegen spans. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.kernels.TextKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : JaroWinklerExpr = copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

/** Exact Jaccard similarity of two sorted distinct long arrays. Generates
  * code (a call into the compiled kernel) so it stays inside whole-stage
  * codegen spans. */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedJaccard(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.kernels.TextKernels.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : SortedJaccardExpr = copy(left = l, right = r)
  override def prettyName: String = "sorted_jaccard"
}

/** Share of the most frequent element in a long array. Generates code (a
  * call into the compiled kernel) so it stays inside whole-stage codegen. */
case class TopFreqShareExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TextKernels.topFreqShare(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.TextKernels.topFreqShare($c)")
  override protected def withNewChildInternal(c: Expression): TopFreqShareExpr = copy(child = c)
  override def prettyName: String = "top_freq_share"
}

/** array<long>: distinct, sorted hashes of character n-gram windows. */
case class CharShingleHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "char shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.charShingleHashSet(v.asInstanceOf[UTF8String], n))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.kernels.TextKernels.charShingleHashSet($c, $n))")
  override protected def withNewChildInternal(c: Expression): CharShingleHashSetExpr =
    copy(child = c)
  override def prettyName: String = "char_shingle_hash_set"
}

/** Subword count (maximal letter/number runs) of a text column. Generates
  * code (a call into the compiled kernel) so it stays inside whole-stage
  * codegen spans. */
case class SubwordCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextKernels.subwordCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.TextKernels.subwordCount($c)")
  override protected def withNewChildInternal(c: Expression): SubwordCountExpr =
    copy(child = c)
  override def prettyName: String = "subword_count"
}

/** Sentence count of a text column — see [[TextKernels.sentenceCount]].
  * Generates code so it stays inside whole-stage codegen. */
case class SentenceCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextKernels.sentenceCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.TextKernels.sentenceCount($c)")
  override protected def withNewChildInternal(c: Expression): SentenceCountExpr =
    copy(child = c)
  override def prettyName: String = "sentence_count"
}

/** Unicode NFC normalization of a string column. Generates code (a call
  * into the compiled kernel, with an ASCII fast path) so it stays inside
  * whole-stage codegen. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextKernels.nfcNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.TextKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** array<string>: ASCII-normalized character n-grams in document order
  * (multiset — the char-LM primitive). See [[TextKernels.charNgrams]]. */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"char ngram size must be >= 1: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextKernels.charNgrams(v.asInstanceOf[UTF8String], n)
      .asInstanceOf[Array[Any]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) " +
        s"graft.functions.kernels.TextKernels.charNgrams($c, $n))")
  override protected def withNewChildInternal(c: Expression): CharNgramsExpr =
    copy(child = c)
  override def prettyName: String = "char_ngrams"
}

/** Column-facing constructors. */
object TextKernelFunctions {
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), n))
  def shingleHashSet(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSetExpr(ColumnBridge.expression(text), n))
  def shingleStrings(text: Column, n: Int, stride: Int = 1): Column =
    ColumnBridge.column(ShingleStringsExpr(ColumnBridge.expression(text), n, stride))
  def tokenChunks(text: Column, size: Int, stride: Int): Column =
    ColumnBridge.column(TokenChunksExpr(ColumnBridge.expression(text), size, stride))
  def minhashSignature(shingleHashSet: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashExpr(ColumnBridge.expression(shingleHashSet), numHashes))
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))
  def minShingleMd5(text: Column, n: Int): Column =
    ColumnBridge.column(MinShingleMd5Expr(ColumnBridge.expression(text), n))
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccardExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def topFreqShare(hashes: Column): Column =
    ColumnBridge.column(TopFreqShareExpr(ColumnBridge.expression(hashes)))
  def subwordCount(text: Column): Column =
    ColumnBridge.column(SubwordCountExpr(ColumnBridge.expression(text)))
  def sentenceCount(text: Column): Column =
    ColumnBridge.column(SentenceCountExpr(ColumnBridge.expression(text)))
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))
  def charShingleHashSet(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingleHashSetExpr(ColumnBridge.expression(text), n))
  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramsExpr(ColumnBridge.expression(text), n))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: edit-distance matching between (or within) key
  * columns at corpus scale — the standard entity-resolution primitive for
  * joining dirty catalogs, author lists, or near-identical titles (no
  * reference counterpart; a north-star extension like [[Dedup]]).
  *
  * Scale design — blocking is the whole trick, exactly as in the dedup
  * family: an unblocked fuzzy join is a cartesian product, so every public
  * record-linkage system (Fellegi–Sunter implementations, splink, dedupe.io)
  * generates candidates per *blocking key* first. Here:
  *  - both sides map to `(id, key, block)` and equi-join ON the block —
  *    one hash shuffle each, candidate pairs bounded by Σ block² instead
  *    of n²;
  *  - a `|len(a) − len(b)| ≤ maxDistance` prune runs before any edit
  *    distance (length difference lower-bounds Levenshtein);
  *  - the distance itself is Spark's native thresholded `levenshtein(l, r,
  *    threshold)` (codegen'd, early-aborts its DP once the band exceeds
  *    the threshold — O(maxDistance·min(len)) per pair, not O(len²)).
  *
  * Skewed blocks (one blocking key covering half the data) are the same
  * hazard as a skewed join key: pick a more selective blocker, or
  * pre-filter hot blocks via [[graft.ops.ScaleOps.keySkewReport]].
  */
object Linkage {

  /** Candidate blockers. `prefixBlocker(n)` — first `n` chars (cheap,
    * order-preserving); `soundexBlocker` — phonetic code, the classic
    * name-matching blocker. Both are plain codegen'd expressions. */
  def prefixBlocker(n: Int): Column => Column = k => substring(k, 1, n)
  val soundexBlocker: Column => Column = k => soundex(k)

  /** Partition count for the candidate-pair self-join. The block join is
    * an EXPLODING join: its input is small (ids + keys) but its output is
    * Σ l·r pairs each paying an edit-distance kernel, and AQE coalesces
    * the shuffle from the INPUT bytes — measured at sf0.1 it folded the
    * q142 join to 2 partitions and ran 1.5M levenshteins on two tasks
    * (guide §2.5: the optimizer cannot see the explosion). Pinning the
    * exchange to the session's shuffle-partition setting restores
    * output-side parallelism and stays scale-configured (the setting, not
    * the local core count, is the contract on a cluster). */
  private def pairJoinPartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Fuzzy inner join of two tables on an edit-distance-≤-`maxDistance`
    * match of their key columns, candidates generated per `blocker` key.
    *
    * Output: `(left_id, right_id, left_key, right_key, dist)` — one row per
    * matched pair per shared block value (a pair whose keys collide in two
    * distinct block values appears once per value; with the single-valued
    * blockers above, exactly once).
    *
    * Recall contract: only pairs agreeing on `blocker` are found — a
    * typo inside the blocked prefix escapes a `prefixBlocker`. Layer a
    * second pass with an independent blocker (e.g. soundex, or a suffix)
    * and union the results for multi-blocker recall, as record-linkage
    * practice does.
    *
    * `maxBlock`: the hot-block analogue of
    * [[graft.operators.Dedup.simhashNearDup]]'s `maxBucket` — a block
    * with l left members and r right members contributes l·r candidate
    * pairs, and on replica-heavy keys the hottest block goes quadratic
    * (the sf1 bench measured the uncapped q142 join 2× super-linear).
    * Blocks whose COMBINED member count (left + right) exceeds the cap
    * drop whole BEFORE the pair join — a recall cap, never a precision
    * risk (every emitted pair still passes the exact edit-distance
    * verification); candidate pairs per surviving block are ≤ cap²/4.
    * [[sortedNeighborhoodPairs]] is the no-blowup alternative when the
    * dropped blocks matter.
    */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftKey: String,
      right: DataFrame, rightId: String, rightKey: String,
      blocker: Column => Column,
      maxDistance: Int = 1,
      maxBlock: Option[Long] = None): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0: $maxDistance")
    maxBlock.foreach(c => require(c >= 2, s"maxBlock must be >= 2: $c"))
    val l0 = left.select(col(leftId).as("left_id"), col(leftKey).as("left_key"),
      blocker(col(leftKey)).as("__block"))
    val r0 = right.select(col(rightId).as("right_id"), col(rightKey).as("right_key"),
      blocker(col(rightKey)).as("__block"))
    // hot-block cap: per-block sizes derive from the same __block-keyed
    // exchange the pair join shuffles on, so AQE reuses it
    val (l, r) = maxBlock.fold((l0, r0)) { cap =>
      val small = l0.select(col("__block"))
        .unionAll(r0.select(col("__block")))
        .groupBy(col("__block")).agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= cap)
        .select(col("__block"))
      (l0.join(small, Seq("__block")), r0.join(small, Seq("__block")))
    }
    // Shape note: the cheap prunes (length band) ride in the join
    // condition, but the thresholded levenshtein is computed ONCE in a
    // post-join projection and filtered on the projected column. Folding
    // `dist >= 0` into the join condition looks natural but makes Catalyst
    // evaluate levenshtein twice per candidate (join condition + output
    // projection) and run it BEFORE the other conjuncts' short-circuit —
    // measured 1.7× slower on the q142 block-join at sf0.1.
    l.repartition(pairJoinPartitions(left), col("__block"))
      .join(r, Seq("__block"))
      .filter(abs(length(col("left_key")) - length(col("right_key"))) <= maxDistance)
      .select(col("left_id"), col("right_id"), col("left_key"), col("right_key"),
        levenshtein(col("left_key"), col("right_key"), maxDistance).as("dist"))
      .filter(col("dist") >= 0) // thresholded levenshtein yields -1 above the cap
  }

  /** Self-linkage: distinct unordered pairs of rows of one table whose keys
    * are within `maxDistance` edits, `id_a < id_b`. Output:
    * `(id_a, id_b, key_a, key_b, dist)`. Same blocking/prune/threshold
    * mechanics as [[fuzzyJoin]], including the `maxBlock` hot-block cap
    * (here block size = member count; blocks over the cap drop whole
    * before the self-join — recall cap, precision intact). */
  def fuzzyDedupPairs(
      df: DataFrame, idCol: String, keyCol: String,
      blocker: Column => Column,
      maxDistance: Int = 1,
      maxBlock: Option[Long] = None): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0: $maxDistance")
    maxBlock.foreach(c => require(c >= 2, s"maxBlock must be >= 2: $c"))
    val a0 = df.select(col(idCol).as("id_a"), col(keyCol).as("key_a"),
      blocker(col(keyCol)).as("__block"))
    val b0 = df.select(col(idCol).as("id_b"), col(keyCol).as("key_b"),
      blocker(col(keyCol)).as("__block"))
    val (a, b) = maxBlock.fold((a0, b0)) { cap =>
      val small = a0.groupBy(col("__block")).agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= cap)
        .select(col("__block"))
      (a0.join(small, Seq("__block")), b0.join(small, Seq("__block")))
    }
    // Same single-evaluation shape as [[fuzzyJoin]]: id ordering + length
    // band prune in the join condition, levenshtein once in the projection.
    a.repartition(pairJoinPartitions(df), col("__block"))
      .join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxDistance)
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        levenshtein(col("key_a"), col("key_b"), maxDistance).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Self-linkage on Jaro–Winkler similarity — the EDIT-DISTANCE-free
    * member of the pair family ([[fuzzyDedupPairs]] bands on absolute
    * edits, which over-matches short keys and under-matches long ones;
    * JW is length-normalized and front-weighted, the convention metric
    * for person/org/product names). Distinct unordered pairs with
    * `jw ≥ threshold`, `id_a < id_b`:
    * `(id_a, id_b, key_a, key_b, jw)`. The kernel
    * ([[graft.functions.kernels.JaroWinklerExpr]]) replays DuckDB's exact
    * conventions (integer-half transpositions, 0.7 boost threshold), so
    * linkage decisions reproduce across engines.
    *
    * Same blocking discipline as the rest of the candidate-pair family:
    * equi-join on the caller's blocker, `maxBlock` drops whole hot
    * blocks BEFORE the self-join (recall cap, precision intact), and the
    * similarity computes ONCE in a post-join projection. */
  def jaroWinklerPairs(
      df: DataFrame, idCol: String, keyCol: String,
      blocker: Column => Column,
      threshold: Double = 0.9,
      maxBlock: Option[Long] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    maxBlock.foreach(c => require(c >= 2, s"maxBlock must be >= 2: $c"))
    val a0 = df.select(col(idCol).as("id_a"), col(keyCol).as("key_a"),
      blocker(col(keyCol)).as("__block"))
    val b0 = df.select(col(idCol).as("id_b"), col(keyCol).as("key_b"),
      blocker(col(keyCol)).as("__block"))
    val (a, b) = maxBlock.fold((a0, b0)) { cap =>
      val small = a0.groupBy(col("__block")).agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= cap)
        .select(col("__block"))
      (a0.join(small, Seq("__block")), b0.join(small, Seq("__block")))
    }
    a.repartition(pairJoinPartitions(df), col("__block"))
      .join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        graft.functions.kernels.TextKernelFunctions
          .jaroWinkler(col("key_a"), col("key_b")).as("jw"))
      .filter(col("jw") >= threshold)
  }

  /** Shared Fellegi–Sunter EM over agreement-PATTERN counts — the
    * classical probabilistic record-linkage model (Fellegi & Sunter 1969;
    * the engine inside splink/RecordLinkage): candidate pairs carry J
    * boolean field-agreement indicators; EM fits, per field, the
    * probability of agreement among true matches (m) and among non-matches
    * (u) plus the match prevalence λ — unsupervised, from the pattern
    * counts alone. Patterns are sorted canonically so the driver-side
    * arithmetic is deterministic; m/u clamp to [1e-6, 1−1e-6] each step
    * (an absorbing 0/1 would NaN the products). Everything here is exact
    * double arithmetic over ≤ 2^J integer counts — engine-reproducible. */
  private def fsEm(patterns: Seq[(Seq[Boolean], Long)], iterations: Int,
      lambda0: Double, m0: Double,
      u0: Double): (Double, Array[Double], Array[Double]) = {
    val j = patterns.head._1.length
    val total = patterns.map(_._2).sum.toDouble
    var lambda = lambda0
    var m = Array.fill(j)(m0)
    var u = Array.fill(j)(u0)
    def clamp(v: Double) = math.min(math.max(v, 0.000001), 0.999999)
    for (_ <- 1 to iterations) {
      val w = patterns.map { case (g, _) =>
        val pm = g.indices.map(i => if (g(i)) m(i) else 1 - m(i)).product
        val pu = g.indices.map(i => if (g(i)) u(i) else 1 - u(i)).product
        val num = lambda * pm
        num / (num + (1 - lambda) * pu)
      }
      val sw = patterns.zip(w).map { case ((_, n), wi) => n * wi }.sum
      val su = total - sw
      m = Array.tabulate(j) { i =>
        clamp(patterns.zip(w).map { case ((g, n), wi) =>
          if (g(i)) n * wi else 0.0 }.sum / sw)
      }
      u = Array.tabulate(j) { i =>
        clamp(patterns.zip(w).map { case ((g, n), wi) =>
          if (g(i)) n * (1 - wi) else 0.0 }.sum / su)
      }
      lambda = clamp(sw / total)
    }
    (lambda, m, u)
  }

  /** Canonically-sorted agreement-pattern counts (≤ 2^J rows — a bounded
    * collect by construction). Complete-case: pairs with a NULL indicator
    * drop. */
  private def fsPatterns(pairs: DataFrame,
      agreementCols: Seq[String]): Seq[(Seq[Boolean], Long)] = {
    require(agreementCols.nonEmpty, "at least one agreement column")
    val keep = agreementCols.map(c => col(c).cast("boolean").isNotNull)
      .reduce(_ && _)
    pairs.filter(keep)
      .groupBy(agreementCols.map(c => col(c).cast("boolean").as(c)): _*)
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => agreementCols.indices.map(r.getBoolean).toSeq ->
        r.getLong(agreementCols.length))
      .sortBy(_._1.map(b => if (b) "1" else "0").mkString)
  }

  /** Fellegi–Sunter per-field match parameters — WHICH fields carry the
    * linkage evidence: for every agreement indicator, the EM-fitted
    * `(m, u)` probabilities and the log-likelihood-ratio weights a
    * scoring rule adds per agreement (`w_agree = ln(m/u)`) or
    * disagreement (`w_disagree = ln((1−m)/(1−u))`), plus the fitted match
    * prevalence λ (same value on every row). Output one row per field in
    * `agreementCols` order: `(field, m, u, w_agree, w_disagree, lambda)`.
    *
    * Scale: ONE pattern-count aggregation over the pairs (≤ 2^J cells,
    * partial-aggregated), EM on the driver over the bounded pattern
    * table, literal output. The pairs input typically comes from
    * [[fuzzyJoin]]/[[fuzzyDedupPairs]] candidates with per-field equality
    * indicators attached. */
  def fellegiSunterWeights(pairs: DataFrame, agreementCols: Seq[String],
      iterations: Int = 3, lambda0: Double = 0.1, m0: Double = 0.9,
      u0: Double = 0.1): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val patterns = fsPatterns(pairs, agreementCols)
    val spark = pairs.sparkSession
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("field", StringType), StructField("m", DoubleType),
      StructField("u", DoubleType), StructField("w_agree", DoubleType),
      StructField("w_disagree", DoubleType), StructField("lambda", DoubleType)))
    if (patterns.isEmpty) {
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }
    val (lambda, m, u) = fsEm(patterns, iterations, lambda0, m0, u0)
    val rows = agreementCols.indices.map { i =>
      org.apache.spark.sql.Row(agreementCols(i), m(i), u(i),
        math.log(m(i) / u(i)), math.log((1 - m(i)) / (1 - u(i))), lambda)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** Fellegi–Sunter per-PATTERN posteriors — the actual linkage decision
    * table: for every observed agreement pattern, how many candidate
    * pairs show it, the posterior match probability under the fitted
    * model, and the pattern's log-likelihood ratio
    * `llr = ln(P(γ|match)/P(γ|non-match))` (the additive FS score).
    * Output one row per observed pattern: `(agreementCols…, n_pairs,
    * llr, posterior)`, pattern columns boolean.
    *
    * Same EM fit and scale shape as [[fellegiSunterWeights]]. */
  def fellegiSunterPosteriors(pairs: DataFrame, agreementCols: Seq[String],
      iterations: Int = 3, lambda0: Double = 0.1, m0: Double = 0.9,
      u0: Double = 0.1): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val patterns = fsPatterns(pairs, agreementCols)
    val spark = pairs.sparkSession
    import org.apache.spark.sql.types._
    val schema = StructType(
      agreementCols.map(c => StructField(c, BooleanType)) ++ Seq(
        StructField("n_pairs", LongType), StructField("llr", DoubleType),
        StructField("posterior", DoubleType)))
    if (patterns.isEmpty) {
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }
    val (lambda, m, u) = fsEm(patterns, iterations, lambda0, m0, u0)
    val rows = patterns.map { case (g, n) =>
      val pm = g.indices.map(i => if (g(i)) m(i) else 1 - m(i)).product
      val pu = g.indices.map(i => if (g(i)) u(i) else 1 - u(i)).product
      val num = lambda * pm
      // Seq[Any]: a bare Seq(n, …) would numeric-widen the Long count to
      // Double and break the LongType schema slot
      org.apache.spark.sql.Row.fromSeq(g ++ Seq[Any](n,
        math.log(pm / pu), num / (num + (1 - lambda) * pu)))
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** Sorted-neighborhood dedup pairs — the classic COMPLEMENT to key
    * blocking ([[fuzzyDedupPairs]]): sort the corpus once on the key and
    * compare each record only to its `window` successors, so candidates
    * that equi-blocks SPLIT (typo in the block-prefix character, boundary
    * values) still meet as sort neighbors, and candidate volume is
    * exactly `window · n` regardless of key distribution (no hot-block
    * blowup). Output `(id_a, id_b, key_a, key_b, dist)` for neighbor
    * pairs within `maxDistance` edits (ids ordered).
    *
    * Shape: one global sort via the two-phase
    * [[graft.ops.IndexOps.stableRowNumber]] (range partition + driver
    * prefix sums — no single-partition stage), then the w-neighbor pairs
    * come from an EQUI-join on `rn_b = rn_a + offset` with the `window`
    * offsets exploded — never a range join, never a window over rows.
    * Sort order is `(key, id)` — total, so the pairing is deterministic. */
  def sortedNeighborhoodPairs(
      df: DataFrame, idCol: String, keyCol: String,
      window: Int = 3, maxDistance: Int = 1): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(maxDistance >= 0, s"maxDistance must be >= 0: $maxDistance")
    val ranked = graft.ops.IndexOps.stableRowNumber(
      df.select(col(idCol).as("id"), col(keyCol).as("key")),
      Seq("key", "id"), "__rn")
    val offsets = explode(array((1 to window).map(lit): _*)).as("__off")
    val a = ranked.select(col("id").as("id_a"), col("key").as("key_a"),
        col("__rn"), offsets)
      .withColumn("__rn_b", col("__rn") + col("__off"))
    val b = ranked.select(col("id").as("id_b"), col("key").as("key_b"),
      col("__rn").as("__rn_b"))
    a.join(b, Seq("__rn_b"))
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxDistance)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        when(col("id_a") <= col("id_b"), col("key_a")).otherwise(col("key_b")).as("key_a"),
        when(col("id_a") <= col("id_b"), col("key_b")).otherwise(col("key_a")).as("key_b"),
        levenshtein(col("key_a"), col("key_b"), maxDistance).as("dist"))
      .filter(col("dist") >= 0)
    // no distinct needed: each unordered pair arises from exactly one
    // (rn, offset) — row numbers are unique under the total sort order
  }
}

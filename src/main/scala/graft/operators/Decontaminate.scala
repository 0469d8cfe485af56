package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.kernels.TextKernelFunctions

/** Benchmark/test-set decontamination for training corpora: flag training
  * documents that share word n-grams with a held-out evaluation set, the
  * standard guard against test-set leakage (n-gram-overlap decontamination
  * as described publicly in the GPT-3 paper's appendix C and the
  * Llama/PaLM data cards; the reference repo has no counterpart — this is
  * a north-star extension like [[Dedup]]).
  *
  * Scale design (the asymmetry is the whole trick): evaluation sets are
  * tiny (MBs) while the training corpus is the 100 TB side, so
  *  - the TEST side is reduced to its distinct 8-byte shingle hashes and
  *    broadcast — no shuffle ever touches the training corpus for the
  *    membership probe;
  *  - the TRAIN side is scanned once: shingle-hash set (compiled kernel,
  *    [[TextKernelFunctions.shingleHashSet]]), explode, broadcast-hash-join
  *    against the test grams, then a count per doc. The only exchange is
  *    the final per-doc count merge, and because `explode` preserves row
  *    partitioning, partial aggregation collapses each doc to one row
  *    before that shuffle — shuffle volume = O(#docs), not O(#ngrams).
  */
object Decontaminate {

  /** Per-training-document n-gram overlap with `test`.
    *
    * Output: one row per train doc —
    * `(train id, n_ngrams, n_hit, contam_frac, contaminated)` where
    * `n_ngrams` is the doc's distinct shingle count, `n_hit` how many of
    * those appear anywhere in the test set, `contam_frac = n_hit/n_ngrams`
    * (0.0 for shingle-less docs) and `contaminated = n_hit >= minOverlap`.
    *
    * @param shingleSize   words per n-gram (production decontamination
    *                      typically uses 8–13; small corpora need smaller)
    * @param minOverlap    hits required to flag a doc
    * @param broadcastTest broadcast the test grams (default; correct
    *                      whenever the eval set fits in an executor — the
    *                      normal case). Set false only for a pathologically
    *                      large test side; the join then shuffles on the
    *                      8-byte hash.
    */
  def ngramOverlap(
      train: DataFrame, trainId: String, trainText: String,
      test: DataFrame, testText: String,
      shingleSize: Int = 13,
      minOverlap: Int = 1,
      broadcastTest: Boolean = true): DataFrame = {
    require(shingleSize > 0, s"shingleSize must be positive: $shingleSize")
    require(minOverlap > 0, s"minOverlap must be positive: $minOverlap")

    val testGrams = test.select(
      explode(TextKernelFunctions.shingleHashSet(col(testText), shingleSize)).as("h"))
      .distinct()
      .withColumn("__hit", lit(1L))
    val probe = if (broadcastTest) broadcast(testGrams) else testGrams

    // explode_outer keeps shingle-less docs (n_ngrams = 0) in the output
    val exploded = train.select(
      col(trainId).as("id"),
      TextKernelFunctions.shingleHashSet(col(trainText), shingleSize).as("sh"))
      .select(col("id"), size(col("sh")).as("n_ngrams"), explode_outer(col("sh")).as("h"))

    exploded.join(probe, Seq("h"), "left")
      .groupBy(col("id"), col("n_ngrams"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(
        col("id"),
        col("n_ngrams"),
        col("n_hit"),
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_ngrams").cast("double"))
          .as("contam_frac"),
        (col("n_hit") >= minOverlap).as("contaminated"))
  }

  /** Leak attribution: WHICH evaluation item each training document shares
    * n-grams with — the audit report behind [[ngramOverlap]]'s per-doc
    * counts (a contamination REVIEW needs the offending eval ids, not just
    * a flag). Output: (train_id, test_id, n_shared) for pairs sharing at
    * least `minShared` distinct shingles.
    *
    * Same asymmetric shape as [[ngramOverlap]] — the test side (now keyed
    * by eval id) broadcasts, the corpus is scanned once — but the count
    * keys on (train, test) pairs, so output and shuffle volume scale with
    * matched pairs × shared grams. Raise `minShared` (or pre-trim eval
    * boilerplate) when an eval set shares stock phrases with everything. */
  def contaminationPairs(
      train: DataFrame, trainId: String, trainText: String,
      test: DataFrame, testId: String, testText: String,
      shingleSize: Int = 13,
      minShared: Int = 1,
      broadcastTest: Boolean = true): DataFrame = {
    require(shingleSize > 0, s"shingleSize must be positive: $shingleSize")
    require(minShared > 0, s"minShared must be positive: $minShared")
    val testGrams = test.select(col(testId).as("test_id"),
      explode(TextKernelFunctions.shingleHashSet(col(testText), shingleSize)).as("h"))
    val probe = if (broadcastTest) broadcast(testGrams) else testGrams
    train.select(col(trainId).as("train_id"),
      explode(TextKernelFunctions.shingleHashSet(col(trainText), shingleSize)).as("h"))
      .join(probe, Seq("h"))
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Semantic (embedding-space) decontamination: per-training-row maximum
    * cosine similarity against the evaluation set's embeddings — catches
    * paraphrased/reworded leakage that n-gram overlap misses (the
    * complement of [[ngramOverlap]]; run both, as modern data cards do).
    *
    * Output: `(id, max_cosine, contaminated)` with
    * `contaminated = max_cosine >= threshold`.
    *
    * Same asymmetric scale shape as the n-gram path: the test side is
    * reduced to its vectors and broadcast, the train corpus is scanned
    * once (broadcast nested-loop, cosine via codegen'd higher-order
    * functions — no UDF), and partial `max` aggregation collapses each
    * train row map-side, so the only exchange is O(#train rows) of
    * (id, double). Compute cost is #train × #test dot products — linear in
    * the corpus because the eval set is a constant. For eval sets too big
    * to scan per row, set `broadcastTest = false` only after pre-reducing
    * the test side (e.g. cluster it to centroids); a shuffled cross join
    * at corpus scale is not a plan. */
  def embeddingOverlap(
      train: DataFrame, trainId: String, trainVec: String,
      test: DataFrame, testVec: String,
      threshold: Double,
      broadcastTest: Boolean = true): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"threshold must be a cosine in [-1, 1]: $threshold")
    val probeBase = test.select(col(testVec).as("__tvec"))
    val probe = if (broadcastTest) broadcast(probeBase) else probeBase
    // The broadcast nested-loop EXPLODES per train row (#test cosines), so
    // scan parallelism is the stage's parallelism — a train corpus small
    // enough to arrive in fewer splits than the session's shuffle setting
    // (locally: one 0.8 MB file = ONE task doing every dot product) spreads
    // first; at real scale the scan already has more splits than the
    // setting and no extra shuffle of the vectors is paid (guide §2.5: the
    // planner sizes from input bytes and cannot see the explosion).
    val trainBase = train.select(col(trainId).as("id"),
      col(trainVec).as("__vec"))
    val spread = train.sparkSession.sessionState.conf.numShufflePartitions
    val trainSpread =
      if (trainBase.rdd.getNumPartitions < spread)
        trainBase.repartition(spread)
      else trainBase
    trainSpread
      .crossJoin(probe)
      .select(col("id"),
        graft.functions.VectorFunctions.cosine(col("__vec"), col("__tvec")).as("__cos"))
      .groupBy(col("id"))
      .agg(max(col("__cos")).as("max_cosine"))
      .select(col("id"), col("max_cosine"),
        (col("max_cosine") >= threshold).as("contaminated"))
  }

  /** Convenience: the decontaminated corpus — train rows whose overlap with
    * `test` stays below `minOverlap` shared n-grams (all original columns). */
  def removeContaminated(
      train: DataFrame, trainId: String, trainText: String,
      test: DataFrame, testText: String,
      shingleSize: Int = 13,
      minOverlap: Int = 1): DataFrame = {
    val flagged = ngramOverlap(train, trainId, trainText, test, testText,
      shingleSize, minOverlap)
      .filter(col("contaminated"))
      .select(col("id"))
    train.join(flagged, train(trainId) === flagged("id"), "left_anti")
  }
}

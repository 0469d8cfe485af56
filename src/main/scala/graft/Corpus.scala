package graft

import graft.operators.{Behavior, CorpusStats, Decontaminate, Dedup, LinearModel, Linkage, Multimodal, Packing, Repetition, Sampling, Search, Similarity, Temporal}
import graft.functions.{TextClean, TextFunctions, VectorFunctions}
import graft.ops.{AggOps, LayoutOps, QualityOps, ScaleOps}
import graft.profile.Drift
import graft.streaming.EventStream

/** One-stop facade for the training-corpus pipeline surface — the
  * extensions beyond reference parity, grouped by pipeline stage so a
  * corpus build reads top-to-bottom ([[ParqTools]] is the sibling facade
  * for the reference's own module surface). All members are the operator
  * objects themselves: zero indirection, every scaladoc and scale note
  * lives on the real implementation.
  *
  * Typical 100 TB corpus build, in this vocabulary:
  * {{{
  * import graft.Corpus._
  * // strike corpus-wide boilerplate lines, then score and gate
  * val delined  = dedup.dedupLines(docs, "id", "text", maxLineDocFreq = 50)
  * val scored   = delined.filter(
  *   repetition.typeTokenRatio(col("text_dedup")) >= 0.4 &&
  *   repetition.topNgramShare(col("text_dedup"), 3) <= 0.2)
  * val cleaned  = decontaminate.removeContaminated(scored, "id", "text_dedup",
  *   evalSet, "text")
  * // admit only docs that don't near-duplicate the historical corpus,
  * // then drop intra-batch near-dups
  * val admitted = dedup.dropAgainstCorpus(cleaned, history, "id", "text_dedup")
  * val unique   = dedup.dropNearDuplicates(admitted, "id", "text_dedup")
  * val capped   = sampling.quotaPerGroup(unique, Seq("domain"),
  *   Seq(col("quality").desc, col("id").asc), k = 1000)
  * // leakage-safe eval holdout, chunk long docs, pack to sequence length
  * val split    = sampling.leakageSafeSplit(capped, "id", "text_dedup",
  *   Seq("train" -> 0.99, "val" -> 0.01))
  * val chunked  = packing.chunkDocuments(split, "id", "text_dedup",
  *   maxTokens = 4096, overlapTokens = 256)
  * val packed   = packing.packByBudget(chunked, "id", "n_chunk_tokens",
  *   budget = 4096)
  * layout.writeZOrdered(packed, Seq("pack_id", "domain"), out, numFiles = 4096)
  * }}}
  */
object Corpus {
  /** Text quality + repetition signals and repairs (zero-shuffle). */
  val repetition: Repetition.type = Repetition
  /** Language-ID, quality score, token counts, fingerprints. */
  val text: TextFunctions.type = TextFunctions
  /** PII redaction, NFC normalization, whitespace repair. */
  val clean: TextClean.type = TextClean
  /** Benchmark decontamination (n-gram overlap vs a held-out set). */
  val decontaminate: Decontaminate.type = Decontaminate
  /** Exact + fuzzy dedup (MinHash LSH, SimHash, n-gram Jaccard, embedding). */
  val dedup: Dedup.type = Dedup
  /** ANN / similarity search (brute-force, LSH, IVF). */
  val similarity: Similarity.type = Similarity
  /** BM25 keyword search — the lexical complement of `similarity`. */
  val search: Search.type = Search
  /** Corpus-wide frequency diagnostics: boilerplate n-gram mining. */
  val stats: CorpusStats.type = CorpusStats
  /** Vector column algebra (cosine, dot, normalization). */
  val vectors: VectorFunctions.type = VectorFunctions
  /** Deterministic splits, samples, mixtures, per-group quotas. */
  val sampling: Sampling.type = Sampling
  /** As-of and range joins. */
  val temporal: Temporal.type = Temporal
  /** Sequence packing by token budget. */
  val packing: Packing.type = Packing
  /** Binary media columns: decode, features, partition sizing. */
  val multimodal: Multimodal.type = Multimodal
  /** Streaming twins: windowed aggs, sessionization, dedup, enrichment,
    * attribution joins. */
  val streaming: EventStream.type = EventStream
  /** Keyed dataset maintenance: upsert, CDC change-log application. */
  val merge: graft.ops.MergeOps.type = graft.ops.MergeOps
  /** Skew salting, bucketing, bloom-prefiltered joins, and the pre-flight
    * diagnostics (key skew, heavy hitters, join fanout) run before them. */
  val scale: ScaleOps.type = ScaleOps
  /** Z-order clustering and small-file compaction. */
  val layout: LayoutOps.type = LayoutOps
  /** Event-behavior analytics: funnels, retention, DAU/WAU, interval
    * coalescing, activity gaps, transitions, rate anomalies. */
  val behavior: Behavior.type = Behavior
  /** Constraint validation and referential-integrity gates. */
  val quality: QualityOps.type = QualityOps
  /** Distribution drift (PSI) between dataset snapshots. */
  val drift: Drift.type = Drift
  /** OLAP reshaping: rollup subtotal reports, pivot cross-tabs. */
  val olap: AggOps.type = AggOps
  /** Fuzzy record linkage: blocked edit-distance joins. */
  val linkage: Linkage.type = Linkage
  /** Linear-classifier training, scoring, and evaluation (rank-AUC,
    * confusion, calibration bins) over hashed text features. */
  val model: LinearModel.type = LinearModel
}

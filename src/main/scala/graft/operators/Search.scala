package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Full-text keyword search over a document corpus — the lexical
  * complement of the embedding ANN operators ([[Similarity]]): BM25 is
  * what retrieval pipelines run before (or fused with) vector search.
  */
object Search {

  /** Top-k TF-IDF keywords per document: for every doc, the `k` terms with
    * the highest `tf · ln(N/df)` (classic idf over the corpus's own
    * document frequencies), ranked on the ROUNDED score with term-asc
    * tie-break — a total order, so the selection is deterministic across
    * engines. `minDf` drops hapax noise from the candidate vocabulary.
    * Output: (doc_id, term, tf, df, tfidf, rank).
    *
    * Plan shape — the bm25 discipline applied doc-side: one corpus scan
    * into the (term, doc) posting aggregation (map-side combined); the
    * corpus size is a scalar broadcast; df joins back on the term key
    * WITHOUT a broadcast hint — unlike bm25's df table (bounded by the
    * QUERY vocabulary), this df covers the corpus's full vocabulary,
    * which at 100 TB is itself billions of hapax-heavy terms, so the
    * planner/AQE must stay free to pick a shuffle join (raise `minDf`
    * to shrink it first); the per-doc top-k runs through the k-bounded
    * heap aggregate ([[Sampling.quotaPerGroup]]) — each partition ships
    * at most k rows per doc into the shuffle, never the full posting
    * list. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDf: Long = 1L, roundTo: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    val posting = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = posting.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val stats = base.agg(count(lit(1)).as("n_docs"))
    val scored = posting
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("tfidf", round(
        col("tf") * log(col("n_docs").cast("double") / col("df")), roundTo))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
    Sampling.quotaPerGroup(scored, Seq("doc_id"),
        Seq(col("tfidf").desc, col("term").asc), k)
      .withColumnRenamed("quota_rank", "rank")
  }

  /** Okapi BM25 top-k: for each query, the `k` highest-scoring documents
    * with `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * over the query's DISTINCT terms, where
    * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))` (the standard
    * non-negative Lucene form). Output: (query_id, doc_id, score, rank),
    * rank ties broken by ascending doc id.
    *
    * Plan shape — the corpus is scanned ONCE and never joined to itself:
    *  - corpus stats (N, avgdl) are one scalar aggregate, attached by a
    *    literal-sized broadcast cross join;
    *  - the exploded token stream is semi-joined to the BROADCAST query
    *    vocabulary first, so the only corpus-wide aggregation — tf per
    *    (term, doc) — runs on matching postings only, with map-side
    *    partial aggregation;
    *  - df per term and the per-query scoring join are broadcast-sized
    *    (bounded by vocabulary, not corpus);
    *  - per-query top-k is a rank window over |queries| partitions of
    *    matched docs only.
    * At 100 TB the one wide stage is the posting aggregation keyed on
    * (term, doc) — a hot query term concentrates on one key only at the
    * PARTIAL stage, which combines map-side before the exchange. For a
    * standing query workload, precompute the full posting table once and
    * write it bucketed by term ([[graft.ops.ScaleOps.writeBucketed]]). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1 >= 0 and 0 <= b <= 1: k1=$k1 b=$b")
    val base = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
      .filter(col("dl") > 0)
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TextFunctions.tokens(col(queryTextCol)))).as("term"))
    val vocab = qterms.select(col("term")).distinct()
    val posting = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(vocab), Seq("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = posting.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = posting
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of several per-query
    * rankings — the standard hybrid-retrieval combiner (BM25 ⊕ dense ANN):
    * `rrf(d) = Σ_r 1/(rrfK + rank_r(d))` over the rankings that returned
    * `d`, then the fused top-`k` per query. Rank-based, so the sources'
    * incomparable score scales never need calibration.
    *
    * Inputs: `(name, ranking)` pairs, each ranking with columns
    * `(query_id, doc_id, rank)` (any extra columns are dropped). Output:
    * one row per fused candidate — `(query_id, doc_id, rank_<name>…
    * (null where that source missed the doc), rrf_score, rank)`, ties on
    * the fused score broken by ascending doc id.
    *
    * Determinism: the fused sum is folded LEFT-TO-RIGHT in the order the
    * rankings are passed (float addition is not associative; a fixed fold
    * order makes the score replayable bit-for-bit by an external engine).
    *
    * Plan shape: each input is already a per-query top-k (|Q|·k rows), so
    * the full-outer joins and the final rank window all run on
    * candidate-sized data — at 100 TB the heavy lifting happened inside
    * the upstream retrievers; fusion itself never touches the corpus. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int,
      rrfK: Int = 60, roundTo: Int = 6): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    // case-insensitive: Spark resolves column names case-insensitively by
    // default, so rank_BM25 and rank_bm25 would still be ambiguous
    require(rankings.map(_._1.toLowerCase).distinct.size == rankings.size,
      s"ranking source names must be distinct (case-insensitive): " +
        rankings.map(_._1).mkString(", "))
    require(k >= 1, s"k must be >= 1: $k")
    require(rrfK >= 0, s"rrfK must be >= 0: $rrfK")
    // CONTRACT: each ranking holds at most one row per (query_id, doc_id)
    // — the shape every top-k retriever here emits. A duplicate pair
    // would multiply through the full-outer join chain (2 copies in one
    // input × 1 in another = 2 output rows, each fused independently).
    val named = rankings.map { case (name, df) =>
      name -> df.select(col("query_id"), col("doc_id"),
        col("rank").cast("int").as(s"rank_$name"))
    }
    val joined = named.map(_._2).reduceLeft { (a, b) =>
      a.join(b, Seq("query_id", "doc_id"), "full_outer")
    }
    val fused = named.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(rrfK) + col(s"rank_$name")), lit(0.0))
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(fused.desc, col("doc_id").asc)
    joined.withColumn("rrf_score", round(fused, roundTo))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Inverted-index build: one row per term with document frequency, total
    * term frequency, and the posting list (ascending doc ids, comma-joined)
    * — the precomputation that turns repeated [[bm25TopK]] runs into posting
    * lookups, and the df table Zipfian stopword analysis reads.
    *
    * `minDf`/`maxDf` bound the emitted vocabulary: `maxDf` drops stopword
    * terms whose posting rows would otherwise be corpus-sized (the df cap
    * both n-gram dedup and decontamination already apply); at 100 TB set it
    * — an uncapped 'the' posting row is one string of every doc id. Plan:
    * explode → per-(term, doc) count (map-side combined — duplicate
    * occurrences inside a doc collapse before the exchange) → per-term
    * collect of already-distinct doc ids. Filters evaluate on the
    * aggregated row, before the posting string is rendered. Write the
    * result bucketed by term ([[graft.ops.ScaleOps.writeBucketed]]) for
    * shuffle-free lookup joins. The df bounds apply to the aggregated rows
    * — capped terms still pay their doc-id collection in the shuffle (only
    * the sort + string render is skipped); when stopword postings dominate
    * volume, pre-filter terms with a df pass and semi-join before calling
    * this. */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 1L,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    require(maxDf >= minDf, s"maxDf must be >= minDf: $maxDf vs $minDf")
    val posting = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    posting.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
        collect_list(col("doc_id")).as("__post"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("term"), col("df"), col("tf_total"),
        array_join(sort_array(col("__post")).cast("array<string>"), ",").as("postings"))
  }

  /** Rank-Biased Overlap between two top-k rankings (Webber et al. 2010) —
    * the ranking-drift measure for "did the search/keyword/frequency
    * ranking change between snapshots?": top-weighted (disagreement at
    * rank 2 costs more than at rank 40), defined on non-conjoint lists
    * (items in one ranking only are handled by construction). Inputs: two
    * frames carrying `idCol` and `rankCol` (dense ranks 1..k). Output one
    * row: `(depth, n_common, rbo, rbo_ext)` — `rbo` is the truncated
    * prefix sum (1−p)·Σ_{d≤k} p^{d−1}·X_d/d (X_d = overlap of the two
    * depth-d prefixes), `rbo_ext` adds the standard X_k/k·p^k
    * extrapolation for the unseen tail.
    *
    * Scale: rankings are top-k by contract — BOUNDED tables (the rank-k
    * producers are TakeOrderedAndProject plans). The overlap-at-depth
    * table computes from one id-keyed join of the two k-row lists and one
    * broadcast inequality join against the k-row depth spine (≤ k² pairs
    * by construction — the documented bounded-side exception to the
    * no-nested-loop rule). Nothing here ever touches the corpus. */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
      p: Double = 0.9, k: Int = 50): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1): $p")
    require(k >= 1, s"k must be >= 1: $k")
    val ra = a.select(col(idCol).as("__id"), col(rankCol).cast("int").as("__ra"))
      .filter(col("__ra") <= k)
    val rb = b.select(col(idCol).as("__id"), col(rankCol).cast("int").as("__rb"))
      .filter(col("__rb") <= k)
    // an id in both lists enters every depth prefix from max(ra, rb) on
    val firstDepth = ra.join(rb, Seq("__id"))
      .select(greatest(col("__ra"), col("__rb")).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__m"))
    val spine = ra.sparkSession.range(1, k + 1).select(col("id").cast("int").as("depth"))
    val xd = spine.join(broadcast(firstDepth), col("__g") <= col("depth"), "left")
      .groupBy(col("depth"))
      .agg(coalesce(sum(col("__m")), lit(0L)).as("__xd"))
    val weight = pow(lit(p), col("depth") - 1) * col("__xd") / col("depth")
    xd.agg(
        max(when(col("depth") === k, col("__xd"))).cast("long").as("n_common"),
        sum(weight).as("__sum"))
      .select(lit(k).as("depth"), col("n_common"),
        ((lit(1.0) - p) * col("__sum")).as("rbo"),
        ((lit(1.0) - p) * col("__sum") +
          col("n_common").cast("double") / k * math.pow(p, k)).as("rbo_ext"))
  }

  /** Per-query ranked-retrieval quality metrics — the offline-eval battery
    * for any ranker in the repo (BM25 [[bm25TopK]], ANN top-k, RRF fusion,
    * recommendation lists): graded NDCG@k, average precision (MAP's
    * per-query term), and reciprocal rank, judged against a relevance
    * table. Inputs: `results(queryCol, docCol, rankCol)` with ranks 1..k
    * per query, and `qrels(queryCol, docCol, relCol)` with integer grades
    * ≥ 0 (absent pair ⇒ grade 0). Output one row per query present in
    * `results`: `(queryCol, n_ranked, n_rel, dcg, idcg, ndcg, ap, rr)`.
    *
    * Semantics (the standard trec_eval conventions):
    *   - gain(rel, rank) = (2^rel − 1) / log₂(rank + 1), ranks beyond `k`
    *     ignored;
    *   - IDCG@k from the query's grades sorted descending (ties share a
    *     gain value, so tie order cannot change the sum), truncated at k;
    *   - AP@k = Σ_{rank r with rel>0} P@r / min(R, k) with R = the query's
    *     TOTAL relevant count (binary rel>0) — the min(R,k) denominator is
    *     the trec_eval truncation convention;
    *   - RR = 1/rank of the first relevant result.
    *   NDCG/AP/RR are NULL for queries with no relevant documents (0/0 is
    *   undefined, and reporting 0 would conflate "ranker failed" with
    *   "nothing to find").
    *
    * Scale: every window is PARTITIONED BY the query key — per-query work
    * is k-bounded (results) or qrel-bounded (IDCG ranking), never global.
    * The results↔qrels join is an equi-join on (query, doc); output height
    * = |queries|. No corpus scan, no global window, no driver collect. */
  def rankingMetrics(results: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String, relCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val res = results.select(
        col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rankCol).cast("int").as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= k)
    val rel = qrels.select(
        col(queryCol).as("__q"), col(docCol).as("__d"),
        col(relCol).cast("double").as("__rel"))
      .filter(col("__rel").isNotNull && col("__rel") > 0)
    // ranked side: graded gain + binary-precision prefix, per query
    val joined = res.join(rel, Seq("__q", "__d"), "left")
      .na.fill(0.0, Seq("__rel"))
    val wRank = Window.partitionBy(col("__q")).orderBy(col("__r"))
    val isRel = when(col("__rel") > 0, 1L).otherwise(0L)
    val perRank = joined
      .withColumn("__gain", (pow(lit(2.0), col("__rel")) - 1) / log2(col("__r") + 1))
      .withColumn("__cumRel", sum(isRel).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ranked = perRank.groupBy(col("__q")).agg(
      count(lit(1)).as("n_ranked"),
      sum(col("__gain")).as("dcg"),
      // AP numerator: precision@r summed at relevant ranks
      sum(when(col("__rel") > 0, col("__cumRel").cast("double") / col("__r"))
        .otherwise(lit(0.0))).as("__apNum"),
      min(when(col("__rel") > 0, col("__r"))).as("__firstRel"))
    // ideal side: grades sorted descending within each query, top k
    val wIdeal = Window.partitionBy(col("__q"))
      .orderBy(col("__rel").desc, col("__d").asc)
    val ideal = rel
      .withColumn("__ir", row_number().over(wIdeal))
      .groupBy(col("__q")).agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__ir") <= k,
          (pow(lit(2.0), col("__rel")) - 1) / log2(col("__ir") + 1))
          .otherwise(lit(0.0))).as("idcg"))
    ranked.join(ideal, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol), col("n_ranked"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("dcg"),
        coalesce(col("idcg"), lit(0.0)).as("idcg"),
        when(col("idcg") > 0, col("dcg") / col("idcg")).as("ndcg"),
        when(col("n_rel") > 0,
          col("__apNum") / least(col("n_rel"), lit(k.toLong)).cast("double"))
          .as("ap"),
        when(col("__firstRel").isNotNull,
          lit(1.0) / col("__firstRel")).as("rr"))
  }
}

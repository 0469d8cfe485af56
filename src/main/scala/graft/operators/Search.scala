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
}

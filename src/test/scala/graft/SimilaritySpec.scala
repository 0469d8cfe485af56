package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val corpus = spark.read.parquet(sf("embeddings"))

  test("brute force top-k: self is the nearest neighbor with cosine 1") {
    val queries = corpus.limit(3).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5)
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
    val top1 = out.filter($"rank" === 1).collect()
    top1.foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("nbr_id"))
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-6)
    }
  }

  test("brute force ranks are descending in cosine") {
    val queries = corpus.limit(1).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val rows = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10).orderBy("rank").collect()
    val sims = rows.map(_.getAs[Double]("cosine")).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("lsh top-k recalls most of the exact top-k") {
    val queries = corpus.limit(5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 3)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", dim = 64, k = 3, numBits = 32, numBands = 16)
      .select("query_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
    // self-match must always survive LSH (identical vector, same buckets)
    assert(approx.count { case (q, n) => q == n } == 5)
  }

  test("query side is broadcast, corpus is not shuffled") {
    val queries = corpus.limit(2).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val plan = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }
}

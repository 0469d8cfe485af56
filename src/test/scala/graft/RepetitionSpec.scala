package graft

import org.apache.spark.sql.functions._
import graft.operators.Repetition

class RepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupLines keeps first occurrences in order") {
    val df = Seq("a\nb\na\nc\nb\nd", "x", "").toDF("text")
    val out = df.select(Repetition.dedupLines($"text")).as[String].collect()
    assert(out.toSeq == Seq("a\nb\nc\nd", "x", ""))
  }

  test("dupLineFrac and dupLineCharFrac count repeated lines") {
    val df = Seq(("four lines two dup", "aa\nbb\naa\nbb"), ("unique", "aa\nbb"),
      ("single", "hello"), ("empty", "")).toDF("name", "text")
    val out = df.select($"name", round(Repetition.dupLineFrac($"text"), 4).as("f"),
        round(Repetition.dupLineCharFrac($"text"), 4).as("cf"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("four lines two dup") == (0.5, 0.5455)) // 6 of 11 chars removed
    assert(out("unique") == (0.0, 0.0))
    assert(out("single") == (0.0, 0.0))
    assert(out("empty") == (0.0, 0.0))
  }

  test("typeTokenRatio is distinct/total tokens") {
    val df = Seq("a b a b", "a b c d", "", "x").toDF("text")
    val out = df.select(Repetition.typeTokenRatio($"text")).as[Double].collect()
    assert(out.toSeq == Seq(0.5, 1.0, 0.0, 1.0))
  }

  test("dupNgramFrac and topNgramShare on a constructed repeat") {
    // "p q p q p q" → bigrams: pq qp pq qp pq = 5 total, 2 distinct,
    // most frequent (pq) occurs 3 times
    val df = Seq("p q p q p q").toDF("text")
    val (dup, top) = df.select(
        round(Repetition.dupNgramFrac($"text", 2), 4),
        round(Repetition.topNgramShare($"text", 2), 4))
      .as[(Double, Double)].head()
    assert(dup == 0.6)   // 1 - 2/5
    assert(top == 0.6)   // 3/5
    // below n tokens → both defined as 0
    val (d2, t2) = df.select(Repetition.dupNgramFrac(lit("x"), 2),
      Repetition.topNgramShare(lit("x"), 2)).as[(Double, Double)].head()
    assert(d2 == 0.0 && t2 == 0.0)
  }

  test("stats equals the relational explode+groupBy formulation") {
    val docs = spark.read.parquet(sf("documents")).limit(200)
    val fast = Repetition.stats(docs, "doc_id", "text", n = 3)
      .select($"id", round($"top_ngram_share", 6).as("s"))
    // reference formulation: explode n-gram hashes, count per (doc, gram),
    // share = max(count)/sum(count)
    val sh = graft.functions.kernels.TextKernelFunctions.shingleHashes($"text", 3)
    val slow = docs.select($"doc_id".as("id"), explode(sh).as("h"))
      .groupBy("id", "h").count()
      .groupBy("id").agg((max($"count").cast("double") /
        sum($"count").cast("double")).as("share"))
    val joined = fast.join(slow, "id")
      .filter(abs($"s" - round($"share", 6)) > 1e-9)
    assert(joined.isEmpty)
    // docs with zero shingles appear in fast with share 0, absent from slow
    assert(fast.count() == docs.count())
  }

  test("plan: stats is a pure projection — no exchange, no explode") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = Repetition.stats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition stats must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"repetition stats must not explode:\n$plan")
  }

  test("filterRepetitive drops the pathological doc, keeps normal text") {
    val df = Seq((1L, "p q p q p q p q p q"), (2L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val kept = Repetition.filterRepetitive(df, "text", n = 2,
      maxDupNgramFrac = 0.3, maxTopNgramShare = 0.3)
      .select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(2L))
  }

}

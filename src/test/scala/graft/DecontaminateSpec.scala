package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  // hand-built corpus with known 3-gram overlaps
  private lazy val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"), // contains test gram
    (2L, "waltz bad nymph for quick jigs vex"),          // no overlap
    (3L, "the quick brown cat sleeps"),                  // shares "the quick brown"
    (4L, "xy"),                                          // too short: zero shingles
    (5L, "five dozen liquor jugs are heavy")             // shares "five dozen liquor" + "dozen liquor jugs"
  ).toDF("doc_id", "text")

  private lazy val test_ = Seq(
    (100L, "the quick brown fox ran"),
    (101L, "five dozen liquor jugs")
  ).toDF("doc_id", "text")

  test("ngramOverlap counts shared shingles per train doc") {
    val out = Decontaminate.ngramOverlap(train, "doc_id", "text", test_, "text",
        shingleSize = 3)
      .orderBy("id")
      .as[(Long, Int, Long, Double, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length == 5) // every train doc appears, even the shingle-less one
    // doc 1: "the quick brown" + "quick brown fox" shared
    assert(byId(1L)._3 == 2L && byId(1L)._5)
    // doc 2: nothing shared
    assert(byId(2L)._3 == 0L && !byId(2L)._5)
    // doc 3: "the quick brown" only
    assert(byId(3L)._3 == 1L && byId(3L)._5)
    // doc 4: zero shingles -> frac defined as 0.0
    assert(byId(4L)._2 == 0 && byId(4L)._3 == 0L && byId(4L)._4 == 0.0)
    // doc 5: "five dozen liquor" + "dozen liquor jugs"
    assert(byId(5L)._3 == 2L && byId(5L)._5)
    // frac = hits / distinct shingles
    assert(math.abs(byId(1L)._4 - 2.0 / byId(1L)._2) < 1e-12)
  }

  test("minOverlap raises the contamination bar") {
    val out = Decontaminate.ngramOverlap(train, "doc_id", "text", test_, "text",
        shingleSize = 3, minOverlap = 2)
      .filter(col("contaminated")).select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 5L)) // doc 3 has only one shared gram
  }

  test("removeContaminated keeps the clean subset with original columns") {
    val out = Decontaminate.removeContaminated(train, "doc_id", "text", test_, "text",
      shingleSize = 3)
    assert(out.columns.toSeq == train.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  test("plan: test grams broadcast, train side never shuffles before the probe") {
    val plan = Decontaminate.ngramOverlap(train, "doc_id", "text", test_, "text",
      shingleSize = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
    // the per-doc count is partially aggregated before its exchange
    assert(plan.contains("partial_") || plan.contains("HashAggregate"),
      s"expected partial aggregation:\n$plan")
  }

  test("broadcastTest=false falls back to a shuffled hash join, same result") {
    val a = Decontaminate.ngramOverlap(train, "doc_id", "text", test_, "text",
      shingleSize = 3)
    val b = Decontaminate.ngramOverlap(train, "doc_id", "text", test_, "text",
      shingleSize = 3, broadcastTest = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("contamination pairs attribute the leak to the right eval item") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 3 shingles with eval 10
      (2L, "alpha beta gamma zeta"), // shares 1 shingle with eval 10
      (3L, "completely unrelated training text here")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "nothing in common with anything")).toDF("doc_id", "text")
    val pairs = Decontaminate.contaminationPairs(train, "doc_id", "text",
      eval, "doc_id", "text", shingleSize = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // only doc 1 reaches 2 shared shingles, and only against eval 10
    assert(pairs == Map((1L, 10L) -> 3L))
    // minShared = 1 surfaces doc 2's single shared shingle too
    val loose = Decontaminate.contaminationPairs(train, "doc_id", "text",
      eval, "doc_id", "text", shingleSize = 3, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 10L), (2L, 10L)))
  }

  test("real corpus: split by id, overlap stats are self-consistent") {
    val docs = spark.read.parquet(sf("documents"))
    val testSide = docs.filter($"doc_id" % 20 === 0)
    val trainSide = docs.filter($"doc_id" % 20 =!= 0)
    val out = Decontaminate.ngramOverlap(trainSide, "doc_id", "text", testSide, "text",
      shingleSize = 3).cache()
    assert(out.count() == trainSide.count())
    assert(out.filter($"n_hit" > $"n_ngrams").isEmpty) // hits bounded by own grams
    assert(out.filter($"contam_frac" < 0 || $"contam_frac" > 1).isEmpty)
    out.unpersist()
  }

  test("embeddingOverlap flags verbatim and near-parallel vectors, not orthogonal ones") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),  // verbatim copy of test vector
      (2L, Seq(10.0f, 0.1f, 0.0f)), // near-parallel (cosine ~ 0.99995)
      (3L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to the test vector
      (4L, Seq(0.0f, 0.0f, 1.0f))   // orthogonal
    ).toDF("id", "vec")
    val testSet = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val out = Decontaminate.embeddingOverlap(train, "id", "vec", testSet, "vec",
        threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.size == 4)
    assert(out(1L)._2 && math.abs(out(1L)._1 - 1.0) < 1e-9)
    assert(out(2L)._2 && out(2L)._1 > 0.99)
    assert(!out(3L)._2 && math.abs(out(3L)._1) < 1e-9)
    assert(!out(4L)._2)
  }

  test("embeddingOverlap takes the MAX over the test set") {
    val train = Seq((1L, Seq(0.0f, 1.0f))).toDF("id", "vec")
    val testSet = Seq(
      (100L, Seq(1.0f, 0.0f)),  // cosine 0
      (101L, Seq(0.0f, 2.0f))   // cosine 1 — the max must win
    ).toDF("id", "vec")
    val row = Decontaminate.embeddingOverlap(train, "id", "vec", testSet, "vec",
      threshold = 0.5).collect().head
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9 && row.getBoolean(2))
  }

  test("embeddingOverlap broadcasts the test side (no shuffle of the corpus)") {
    val train = spark.read.parquet(sf("embeddings"))
    val testSet = train.filter($"vec_id" < 5)
    val plan = Decontaminate.embeddingOverlap(train, "vec_id", "embedding",
      testSet, "embedding", threshold = 0.9).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }
}

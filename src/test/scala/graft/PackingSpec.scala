package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("documents"))
    .select($"doc_id", $"n_chars")

  test("packByBudget equals the sequential exclusive prefix sum") {
    val out = Packing.packByBudget(docs, "doc_id", "n_chars",
        budget = 10000, blockSize = 64)
      .select($"doc_id", $"n_chars", $"start_offset", $"pack_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

    var running = 0L
    out.foreach { case (_, n, start, pack) =>
      assert(start === running, "start_offset must be the exclusive cumsum")
      assert(pack === start / 10000)
      running += n
    }
  }

  test("packByBudget is invariant to blockSize and input partitioning") {
    val a = Packing.packByBudget(docs, "doc_id", "n_chars", 10000, blockSize = 7)
    val b = Packing.packByBudget(docs.repartition(13), "doc_id", "n_chars",
      10000, blockSize = 1L << 20)
    assert(a.select("doc_id", "start_offset", "pack_id")
      .exceptAll(b.select("doc_id", "start_offset", "pack_id")).isEmpty)
  }

  test("packByBudget plan: data-side window is partitioned by block") {
    val plan = Packing.packByBudget(docs, "doc_id", "n_chars", 10000, blockSize = 64)
      .queryExecution.executedPlan.toString
    // the only unpartitioned window must run over the aggregated block
    // table (one row per block), never over the document stream
    assert(plan.contains("windowspecdefinition(__blk"),
      s"expected the per-block window in the plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"block offsets must broadcast back, not shuffle the data:\n$plan")
  }

  test("chunkDocuments: overlap windows, tail kept, every token covered") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // fits in one chunk
      (3L, "   ")).toDF("doc_id", "text")              // blank → no rows
    val out = graft.operators.Packing
      .chunkDocuments(docs, "doc_id", "text", maxTokens = 4, overlapTokens = 1)
      .orderBy("id", "chunk_index").collect()
    // doc 1, stride 3: starts 0,3,6,9 → 4 chunks, last is the 1-token tail
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(d1.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(4, 4, 4, 1))
    assert(d1.map(_.getAs[Int]("chunk_index")).toSeq == Seq(0, 1, 2, 3))
    // consecutive chunks share exactly the overlap
    assert(d1(0).getAs[String]("chunk_text").split(" ").last ==
      d1(1).getAs[String]("chunk_text").split(" ").head)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk_text") == "a b c")
    assert(!out.exists(_.getLong(0) == 3L))
  }

  test("packing stats: per-pack fill, doc counts, conservation") {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = Seq((1L, 60L), (2L, 50L), (3L, 40L), (4L, 10L))
      .toDF("doc_id", "sz")
    // offsets 0,60,110,150 with budget 100 → packs 0,0,1,1
    val packed = graft.operators.Packing.packByBudget(docs, "doc_id", "sz", budget = 100L)
    val stats = graft.operators.Packing.packingStats(packed, "sz", budget = 100L)
      .orderBy("pack_id").collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(stats.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 2L))
    assert(stats.map(_.getAs[Long]("total_size")).toSeq == Seq(110L, 50L))
    assert(stats.map(_.getAs[Double]("fill")).toSeq == Seq(1.1, 0.5))
    // conservation: pack totals sum to the corpus total
    assert(stats.map(_.getAs[Long]("total_size")).sum == 160L)
    intercept[IllegalArgumentException] {
      graft.operators.Packing.packingStats(docs, "sz", budget = 100L)
    }
  }
}

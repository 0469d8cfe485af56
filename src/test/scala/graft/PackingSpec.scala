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
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Components, Dedup}

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("chain, triangle and singleton resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, singleton 20
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val out = Components.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L))
    assert(out(20L) == 20L)
    assert(out.size == 8)
  }

  test("long chain converges within the diameter bound; tight bound throws") {
    val n = 12
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Components.connectedComponents(vertices, edges, maxIter = 15)
      .as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L))
    intercept[IllegalStateException] {
      Components.connectedComponents(vertices, edges, maxIter = 2).count()
    }
  }

  test("nearDupClusters collapses the transitive near-dup chain") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "completely different content about spark query engines and columnar formats"))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L) // one cluster
    assert(out(4L) == 4L) // untouched doc is its own component
  }
}

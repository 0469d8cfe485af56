package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val media = Multimodal.withFakeMedia(
    spark.read.parquet(sf("documents")).limit(50), "text")

  test("fake media payload carries binary + typed metadata struct") {
    assert(media.schema("media_bytes").dataType.typeName == "binary")
    val meta = media.select($"media_meta.*")
    assert(meta.columns.toSeq ==
      Seq("modality", "format", "width", "height", "duration_ms", "size_bytes"))
    val r = meta.head()
    assert(r.getAs[String]("modality") == "image")
    assert(r.getAs[Int]("width") >= 32 && r.getAs[Long]("size_bytes") > 0)
  }

  test("decode stub produces deterministic fixed-dim features via mapPartitions") {
    val f1 = Multimodal.decodeStub(media, "media_bytes", "doc_id", featureDim = 16)
    assert(f1.count() == 50)
    assert(f1.head().getSeq[Float](1).size == 16)
    // deterministic: same input → identical features
    val a = f1.orderBy("id").collect().map(_.getSeq[Float](1))
    val b = Multimodal.decodeStub(media, "media_bytes", "doc_id", 16)
      .orderBy("id").collect().map(_.getSeq[Float](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("frame sampling explodes n frames per row") {
    val frames = Multimodal.sampleFrames(media.limit(4), "media_bytes", n = 3)
    assert(frames.count() == 12)
    assert(frames.select("frame_index").distinct().count() == 3)
    assert(frames.schema("frame_bytes").dataType.typeName == "binary")
  }

  test("stub features feed the similarity pipeline end to end") {
    val feats = Multimodal.decodeStub(media, "media_bytes", "doc_id", 16)
    val queries = feats.limit(2).select($"id".as("qid"), $"features".as("qvec"))
    val knn = graft.operators.Similarity.bruteForceTopK(
      feats, "id", "features", queries, "qid", "qvec", k = 3)
    assert(knn.filter($"rank" === 1).collect()
      .forall(r => r.getAs[Long]("query_id") == r.getAs[Long]("nbr_id")))
  }
}

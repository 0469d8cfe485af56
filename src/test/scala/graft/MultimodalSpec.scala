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

  test("real image decode: javax.imageio recovers dimensions and pooled features") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import spark.implicits._
    // left half black, right half white -> first-grid-column features dark,
    // last-grid-column features bright
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq((1L, png(64, 32)), (2L, png(16, 16)), (3L, "not an image".getBytes)).toDF("id", "media_bytes")
    val out = Multimodal.decodeImages(df, "media_bytes", "id", featureDim = 16)
      .orderBy("id").collect()
    assert(out(0).getAs[Int]("width") == 64 && out(0).getAs[Int]("height") == 32)
    assert(out(0).getAs[Boolean]("decoded"))
    val feats = out(0).getSeq[Float](out(0).fieldIndex("features"))
    assert(feats.length == 16)
    assert(feats(0) < 0.1f && feats(3) > 0.9f) // 4x4 grid: col 0 black, col 3 white
    assert(out(1).getAs[Int]("width") == 16)
    assert(!out(2).getAs[Boolean]("decoded")) // corrupt payload survives, flagged
    assert(out(2).isNullAt(out(2).fieldIndex("width")))
  }

  test("real image resize: aspect preserved, no upscaling, corrupt passthrough") {
    import spark.implicits._
    val src = Seq((1L, 100, 40, 128), (2L, 8, 8, 200)).toDF("id", "w", "h", "g")
    val media = Multimodal.withGeneratedPng(src, "id", $"w", $"h", $"g")
      .unionByName(Seq((3L, "junk".getBytes)).toDF("id", "media_bytes"))
    val out = Multimodal.resizeImages(media, "media_bytes", "id", maxSide = 50)
      .orderBy("id").collect()
    // 100x40 -> 50x20 (aspect kept, longest side = maxSide)
    assert(out(0).getAs[Int]("width") == 50 && out(0).getAs[Int]("height") == 20)
    assert(out(0).getAs[Boolean]("resized"))
    // the resized payload is REAL: decode it back and check dimensions + tone
    val back = Multimodal.decodeImages(
      spark.createDataFrame(java.util.List.of(out(0)), out(0).schema),
      "media_bytes", "id", featureDim = 4).head()
    assert(back.getAs[Int]("width") == 50 && back.getAs[Int]("height") == 20)
    val f = back.getSeq[Float](back.fieldIndex("features"))
    assert(f.forall(v => math.abs(v - 128.0 / 255.0) < 0.05)) // uniform gray kept
    // already-small image passes through at original size
    assert(out(1).getAs[Int]("width") == 8 && out(1).getAs[Int]("height") == 8)
    // corrupt payload: untouched bytes, flagged
    assert(!out(2).getAs[Boolean]("resized"))
    assert(new String(out(2).getAs[Array[Byte]]("media_bytes")) == "junk")
  }

  test("real audio decode: WAV sine tone recovers rate, duration and RMS") {
    import spark.implicits._
    // full-scale sine RMS = 1/sqrt(2); half amplitude halves it
    val src = Seq((1L, 440.0, 500, 1.0), (2L, 880.0, 250, 0.5))
      .toDF("id", "freq", "ms", "amp")
    val media = Multimodal.withGeneratedWav(src, "id", $"freq", $"ms", $"amp")
      .unionByName(Seq((3L, "not audio".getBytes)).toDF("id", "media_bytes"))
    val out = Multimodal.decodeAudio(media, "media_bytes", "id").orderBy("id").collect()
    assert(out(0).getAs[Boolean]("decoded"))
    assert(out(0).getAs[Int]("sample_rate") == 8000)
    assert(out(0).getAs[Int]("channels") == 1)
    assert(out(0).getAs[Long]("duration_ms") == 500L)
    assert(math.abs(out(0).getAs[Double]("rms") - 1.0 / math.sqrt(2)) < 0.01)
    assert(math.abs(out(1).getAs[Double]("rms") - 0.5 / math.sqrt(2)) < 0.01)
    assert(out(1).getAs[Long]("duration_ms") == 250L)
    assert(!out(2).getAs[Boolean]("decoded")) // corrupt payload survives, flagged
  }

  test("real frame extraction: animated GIF frames decode with exact gray levels") {
    import spark.implicits._
    val media = Multimodal.withGeneratedGif(Seq(5L, 9L).toDF("id"), "id", frames = 6)
      .unionByName(Seq((3L, "not a gif".getBytes)).toDF("id", "media_bytes"))
    val out = Multimodal.sampleFramesReal(media, "media_bytes", "id")
      .orderBy("id", "frame_index").collect()
    val good = out.filter(_.getAs[Boolean]("decoded"))
    assert(good.length == 12) // 6 frames x 2 rows
    good.foreach { r =>
      val id = r.getAs[Long]("id"); val fi = r.getAs[Int]("frame_index")
      val expected = ((id * 7 + fi * 13) % 256) / 255.0
      assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 16)
      assert(math.abs(r.getAs[Double]("mean_luminance") - expected) < 1e-6,
        s"id=$id frame=$fi: ${r.getAs[Double]("mean_luminance")} vs $expected")
    }
    // stride skips frames
    val strided = Multimodal.sampleFramesReal(
      Multimodal.withGeneratedGif(Seq(1L).toDF("id"), "id", frames = 6),
      "media_bytes", "id", stride = 2)
    assert(strided.select("frame_index").as[Int].collect().sorted.toSeq == Seq(0, 2, 4))
    // corrupt payload: one flagged row
    val bad = out.filter(!_.getAs[Boolean]("decoded"))
    assert(bad.length == 1 && bad.head.getAs[Long]("id") == 3L)
  }

  test("MP4 demux: real BMFF box walk, exact frame recovery, corrupt safety") {
    import spark.implicits._
    val media = Multimodal.withGeneratedMp4(Seq(5L, 9L).toDF("id"), "id",
        frames = 6, width = 16, height = 16)
      .unionByName(Seq((3L, "not an mp4 file at all".getBytes))
        .toDF("id", "media_bytes"))
    val out = Multimodal.sampleFramesMp4(media, "media_bytes", "id")
      .orderBy("id", "frame_index").collect()
    val good = out.filter(_.getAs[Boolean]("decoded"))
    assert(good.length == 12) // 6 frames x 2 rows
    good.foreach { r =>
      val id = r.getAs[Long]("id"); val fi = r.getAs[Int]("frame_index")
      val expected = ((id * 11 + fi * 17) % 256) / 255.0
      assert(r.getAs[String]("codec") == "png ")
      assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 16)
      assert(math.abs(r.getAs[Double]("mean_luminance") - expected) < 1e-6,
        s"id=$id frame=$fi: ${r.getAs[Double]("mean_luminance")} vs $expected")
    }
    assert(out.count(!_.getAs[Boolean]("decoded")) == 1)
    // stride samples every other video sample
    val strided = Multimodal.sampleFramesMp4(
      Multimodal.withGeneratedMp4(Seq(1L).toDF("id"), "id", frames = 6),
      "media_bytes", "id", stride = 2)
    assert(strided.select("frame_index").as[Int].collect().sorted.toSeq == Seq(0, 2, 4))
  }

  test("Motion-JPEG MP4: real JPEG samples decode to exact gray levels") {
    import spark.implicits._
    val media = Multimodal.withGeneratedMjpegMp4(Seq(5L, 9L).toDF("id"), "id",
      frames = 4, width = 16, height = 16)
    val out = Multimodal.sampleFramesMp4(media, "media_bytes", "id")
      .orderBy("id", "frame_index").collect()
    assert(out.length == 8 && out.forall(_.getAs[Boolean]("decoded")))
    out.foreach { r =>
      val id = r.getAs[Long]("id"); val fi = r.getAs[Int]("frame_index")
      val expected = ((id * 11 + fi * 17) % 256) / 255.0
      assert(r.getAs[String]("codec") == "jpeg")
      assert(math.abs(r.getAs[Double]("mean_luminance") - expected) < 1e-6,
        s"id=$id frame=$fi: ${r.getAs[Double]("mean_luminance")} vs $expected")
    }
  }

  test("JPEG uniform-gray frames are lossless at EVERY gray level 0..255") {
    // the q173 oracle depends on exact recovery through the lossy codec:
    // a uniform frame is DC-only per 8x8 block with zero chroma, and the
    // JVM encoder's DC quantizer divides the coefficient exactly — check
    // every level so no future encoder change silently breaks the oracle
    javax.imageio.ImageIO.setUseCache(false)
    for (g <- 0 until 256) {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      for (y <- 0 until 16; x <- 0 until 16)
        assert((back.getRGB(x, y) & 0xffffff) == (rgb & 0xffffff),
          s"gray $g did not survive the JPEG round trip at ($x,$y)")
    }
  }

  test("IsoBmff demuxer handles the corpus of malformed containers") {
    import graft.io.IsoBmff
    val png = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ok = IsoBmff.muxVideo(Seq(png, png, png), "png ", 4, 4)
    // round trip: codec + sample payloads bit-identical
    val track = IsoBmff.demuxVideo(ok).get
    assert(track.codec == "png " && track.samples.size == 3)
    assert(track.samples.forall(_.sameElements(png)))
    // truncation anywhere must give None, never a crash or garbage frames
    for (cut <- Seq(0, 4, 7, 20, ok.length / 2, ok.length - 4))
      assert(IsoBmff.demuxVideo(ok.take(cut)).isEmpty, s"cut=$cut")
    // bit flips in the size fields must not escape as exceptions
    for (i <- 0 until math.min(64, ok.length)) {
      val mut = ok.clone(); mut(i) = (mut(i) ^ 0x5a).toByte
      IsoBmff.demuxVideo(mut) // any Option outcome is fine; throwing is not
    }
    assert(IsoBmff.demuxVideo(Array.emptyByteArray).isEmpty)
  }

  test("dhashImages: 4-tone quarters give the closed-form hash; uniform gives 0") {
    import spark.implicits._
    val ids = Seq((1L, 10, 200, 10, 200), (2L, 50, 50, 50, 50), (3L, 200, 100, 50, 25))
      .toDF("id", "a", "b", "c", "d")
    val media = Multimodal.withGeneratedQuarterPng(ids, "id", 16, 8,
      col("a"), col("b"), col("c"), col("d"))
    val out = Multimodal.dhashImages(media, "media_bytes", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    def expected(a: Int, b: Int, c: Int, d: Int): Long =
      (((if (b > a) 2L else 0L) + (if (c > b) 8L else 0L) +
        (if (d > c) 96L else 0L)) * 0x0101010101010101L)
    assert(out(1L) == ((expected(10, 200, 10, 200), true)))
    assert(out(2L) == ((0L, true)))            // uniform image: no gradients
    assert(out(3L) == ((expected(200, 100, 50, 25), true))) // strictly falling: 0
    assert(out(3L)._1 == 0L)
  }

  test("dhashImages: undecodable payloads report decoded=false with null hash") {
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4, 5))).toDF("id", "media_bytes")
    val row = Multimodal.dhashImages(junk, "media_bytes", "id").collect().head
    assert(!row.getBoolean(2) && row.isNullAt(1))
  }

  test("dhashAudio: step-amplitude tone gives the closed-form energy hash") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 5, 3, 9, 2, 2, 8, 4)), (2L, Seq(9, 9, 9, 9, 9, 9, 9, 9)))
      .toDF("id", "levels")
    val media = Multimodal.withGeneratedStepWav(df, "id",
      col("levels"), samplesPerSegment = 160)
    val out = Multimodal.dhashAudio(media, "media_bytes", "id", segments = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    def expected(lv: Seq[Int]): Long =
      lv.sliding(2).zipWithIndex.foldLeft(0L) { case (h, (Seq(a, b), j)) =>
        if (b > a) h | (1L << j) else h
      }
    assert(out(1L) == ((expected(Seq(1, 5, 3, 9, 2, 2, 8, 4)), true)))
    assert(out(2L) == ((0L, true))) // flat loudness: no energy gradients
  }

  test("dhashAudio: undecodable or non-PCM16-mono payloads report decoded=false") {
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](82, 73, 70, 70, 0, 0))).toDF("id", "media_bytes")
    val row = Multimodal.dhashAudio(junk, "media_bytes", "id").collect().head
    assert(!row.getBoolean(2) && row.isNullAt(1))
  }

  test("dhash + hamming64Pairs: identical layouts pair at distance 0") {
    import spark.implicits._
    val ids = Seq((1L, 10, 200, 30, 90), (2L, 10, 200, 30, 90), (3L, 250, 1, 250, 1))
      .toDF("id", "a", "b", "c", "d")
    val media = Multimodal.withGeneratedQuarterPng(ids, "id", 16, 8,
      col("a"), col("b"), col("c"), col("d"))
    val hashes = Multimodal.dhashImages(media, "media_bytes", "id")
    val pairs = graft.operators.Dedup.hamming64Pairs(hashes, "id", "dhash",
        maxHamming = 3, numChunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)))
  }
}

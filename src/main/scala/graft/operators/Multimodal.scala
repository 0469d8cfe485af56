package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extensions, SURVEY §7.2 step 10).
  *
  * Media (image/audio/video) rides as opaque `binary` columns with a typed
  * metadata struct alongside. Images decode for real via `javax.imageio`
  * (PNG/JPEG/GIF/BMP readers ship with every JVM) — [[decodeImages]] /
  * [[resizeImages]] — audio decodes for real via `javax.sound.sampled`
  * (WAV/AIFF/AU PCM readers ship with every JVM) — [[decodeAudio]] — and
  * MP4/QuickTime video containers demux for real via the in-repo ISO BMFF
  * box parser ([[graft.io.IsoBmff]]) with per-sample image decode
  * ([[sampleFramesMp4]]; intra-coded codecs `png `/`jpeg`). Inter-coded
  * bitstreams (H.264 etc.) still need an external codec — plug one into
  * the same `mapPartitions` shape ([[decodeStub]] marks the seam) without
  * touching the pipeline.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("size_bytes", LongType, nullable = false)))

  /** Attach a deterministic fake binary payload + metadata struct derived
    * from an existing column — used to exercise the pipeline where no real
    * media exists. Payload bytes = UTF-8 of the source column (stand-in for
    * encoded media). */
  def withFakeMedia(df: DataFrame, sourceCol: String, modality: String = "image"): DataFrame =
    df.withColumn("media_bytes", encode(col(sourceCol).cast("string"), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(modality).as("modality"),
        lit("fake/v1").as("format"),
        (pmod(xxhash64(col(sourceCol)), lit(1920)) + 32).cast("int").as("width"),
        (pmod(xxhash64(col(sourceCol), lit(1)), lit(1080)) + 32).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        length(col("media_bytes")).cast("long").as("size_bytes")))

  /** STUB decode + feature-extract: media bytes → fixed-size float feature
    * vector. Deterministic fake (hash-seeded), NOT a real decoder — the
    * real implementation plugs in here. Runs as batched per-partition
    * processing (`mapPartitions`), the same execution shape a real
    * vectorized decoder needs: one decoder init per partition, streaming
    * over rows, no per-row JVM↔native churn. */
  def decodeStub(df: DataFrame, bytesCol: String, idCol: String, featureDim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens here in a real decoder (codec contexts,
        // thread-local buffers); the stub needs none
        rows.map { case (id, bytes) =>
          // ??? real decode goes here; deterministic fake features instead:
          (id, fakeFeatures(bytes, featureDim))
        }
      }
      .toDF("id", "features")
  }

  /** Deterministic tiny-PNG synthesizer (the multimodal twin of
    * [[graft.sources.DemoBlockModel]]): one `width`×`height` uniform-gray
    * PNG per row, encoded per-partition with the JVM PNG writer. Gives the
    * decode pipeline REAL encoded media with externally predictable
    * content — dimensions and gray level are pure functions of the row, so
    * an independent engine can verify what the decoder recovers. */
  def withGeneratedPng(df: DataFrame, idCol: String,
      width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      gray: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), width.cast("int"), height.cast("int"),
        gray.cast("int"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, w, h, g) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** Deterministic 4-tone PNG synthesizer: each row's image is split into
    * four vertical quarters with gray levels `(g1, g2, g3, g4)` — unlike
    * the uniform [[withGeneratedPng]], the content has internal structure,
    * so perceptual hashes ([[dhashImages]]) of the decoded bytes are
    * non-trivial yet remain pure functions of the row (oracle-predictable).
    * Width must be divisible by 4 for exact quarter boundaries. */
  def withGeneratedQuarterPng(df: DataFrame, idCol: String,
      width: Int, height: Int,
      g1: org.apache.spark.sql.Column, g2: org.apache.spark.sql.Column,
      g3: org.apache.spark.sql.Column, g4: org.apache.spark.sql.Column): DataFrame = {
    require(width % 4 == 0, s"width must be divisible by 4: $width")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), g1.cast("int"), g2.cast("int"),
        g3.cast("int"), g4.cast("int"))
      .as[(Long, Int, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, a, b, c, d) =>
          val img = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val grays = Array(a, b, c, d)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val g = grays(x * 4 / width)
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** Perceptual difference hash (dHash — the standard public
    * perceptual-dedup fingerprint): decode, area-pool luminance to a 9×8
    * grid (same floor pixel→cell mapping as [[decodeImages]]), set bit
    * `r*8 + j` (LSB-first) iff `cell[r][j+1] > cell[r][j]`. Output:
    * `(id, dhash, decoded)` — null hash for undecodable payloads.
    * Near-identical images (recompressed, slightly rescaled) land within
    * a few bits; feed the hash column to
    * [[Dedup.hamming64Pairs]] for banded near-dup candidate generation.
    * Same per-partition batched `mapPartitions` shape as [[decodeImages]]
    * (media codecs have no Catalyst expression form). */
  def dhashImages(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          dhashOne(bytes) match {
            case Some(h) => (id, Some(h), true)
            case None => (id, Option.empty[Long], false)
          }
        }
      }
      .toDF("id", "dhash", "decoded")
  }

  private[operators] def dhashOne(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val gw = 9; val gh = 8
        val sums = new Array[Double](gw * gh)
        val counts = new Array[Long](gw * gh)
        var y = 0
        while (y < h) {
          val gy = y * gh / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            val cell = gy * gw + (x * gw / w)
            sums(cell) += lum
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var r = 0
        while (r < gh) {
          var j = 0
          while (j < gw - 1) {
            val left = if (counts(r * gw + j) > 0) sums(r * gw + j) / counts(r * gw + j) else 0.0
            val right = if (counts(r * gw + j + 1) > 0) sums(r * gw + j + 1) / counts(r * gw + j + 1) else 0.0
            if (right > left) hash |= 1L << (r * (gw - 1) + j)
            j += 1
          }
          r += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }

  /** REAL image decode + feature extraction via `javax.imageio`: payload
    * bytes → (width, height, mean-pooled luminance grid as the feature
    * vector). Runs as batched per-partition processing with one-time
    * per-partition init (`ImageIO.setUseCache(false)` — no temp-file churn
    * on executors), streaming rows — the same execution shape as
    * [[decodeStub]], now doing its nominal job. Rows whose payload no JVM
    * reader can decode come back with `decoded = false` and null metrics
    * (corrupt media must not kill a 100 TB job). */
  def decodeImages(df: DataFrame, bytesCol: String, idCol: String,
      featureDim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition decoder init
        rows.map { case (id, bytes) =>
          decodeOne(bytes, featureDim) match {
            case Some((w, h, feats)) => (id, Some(w), Some(h), feats, true)
            case None => (id, Option.empty[Int], Option.empty[Int],
              Array.empty[Float], false)
          }
        }
      }
      .toDF("id", "width", "height", "features", "decoded")
  }

  /** REAL image resize: decode, downscale so the longest side is at most
    * `maxSide` (aspect preserved; never upscales), re-encode as PNG.
    * Same per-partition batched shape as [[decodeImages]]; undecodable
    * payloads pass through untouched with `resized = false`. Output:
    * `(id, width, height, media_bytes, resized)` with post-resize
    * dimensions. */
  def resizeImages(df: DataFrame, bytesCol: String, idCol: String,
      maxSide: Int): DataFrame = {
    require(maxSide > 0, s"maxSide must be positive: $maxSide")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          resizeOne(bytes, maxSide) match {
            case Some((w, h, out)) => (id, Some(w), Some(h), out, true)
            case None => (id, Option.empty[Int], Option.empty[Int], bytes, false)
          }
        }
      }
      .toDF("id", "width", "height", "media_bytes", "resized")
  }

  private[operators] def resizeOne(bytes: Array[Byte],
      maxSide: Int): Option[(Int, Int, Array[Byte])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        if (scale >= 1.0) Some((w, h, bytes)) // already small enough
        else {
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, nw, nh, null)
          g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some((nw, nh, bos.toByteArray))
        }
      }
    } catch { case _: Exception => None }

  /** Deterministic WAV synthesizer (the audio twin of [[withGeneratedPng]]):
    * one mono 16-bit PCM sine tone per row — frequency, duration and
    * amplitude are pure functions of the row, so an independent engine can
    * verify what the decoder recovers. */
  def withGeneratedWav(df: DataFrame, idCol: String,
      freqHz: org.apache.spark.sql.Column, durationMs: org.apache.spark.sql.Column,
      amplitude: org.apache.spark.sql.Column,
      sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), freqHz.cast("double"),
        durationMs.cast("int"), amplitude.cast("double"))
      .as[(Long, Double, Int, Double)]
      .mapPartitions { rows =>
        rows.map { case (id, f, ms, amp) =>
          // Long math: 44100 Hz * a 49-second clip already overflows Int
          val nL = sampleRate.toLong * ms / 1000L
          require(nL >= 0 && nL <= Int.MaxValue / 2,
            s"sample count out of range: $nL (rate=$sampleRate, ms=$ms)")
          val n = nL.toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (amp * math.sin(2.0 * math.Pi * f * i / sampleRate) * 32767.0).toInt
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** Deterministic step-amplitude WAV synthesizer: one mono 16-bit PCM
    * sine tone per row whose amplitude steps through `levels` (integer
    * tenths: 1..9 → 0.1..0.9) across equal-length segments of
    * `samplesPerSegment` samples. The audio twin of
    * [[withGeneratedQuarterPng]]: segment energies are ordered exactly as
    * the integer levels, so the segment-energy hash ([[dhashAudio]]) of
    * the decoded bytes is closed-form in the level sequence. */
  def withGeneratedStepWav(df: DataFrame, idCol: String,
      levels: org.apache.spark.sql.Column,
      samplesPerSegment: Int = 160, freqHz: Double = 400.0,
      sampleRate: Int = 8000): DataFrame = {
    require(samplesPerSegment > 0, s"samplesPerSegment must be positive: $samplesPerSegment")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), levels.cast("array<int>"))
      .as[(Long, Seq[Int])]
      .mapPartitions { rows =>
        rows.map { case (id, lv) =>
          require(lv.nonEmpty && lv.forall(l => l >= 1 && l <= 9),
            s"levels must be in 1..9: $lv")
          val n = lv.size * samplesPerSegment
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val amp = lv(i / samplesPerSegment) / 10.0
            val s = (amp * math.sin(2.0 * math.Pi * freqHz * i / sampleRate) * 32767.0).toInt
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** Audio segment-energy difference hash — the audio analogue of the
    * image [[dhashImages]] and the third leg of the multimodal near-dup
    * family (text SimHash, image dHash, audio energy hash): decode the
    * PCM payload, split the mono samples into `segments` equal blocks,
    * set bit `j` (LSB-first) iff block `j+1` has higher mean-square
    * energy than block `j`. Loudness-profile-preserving edits
    * (re-encoding, small trims, volume normalization applied uniformly)
    * keep most bits; feed to [[Dedup.hamming64Pairs]] for banded
    * candidate generation. `segments` is capped at 64 (63 usable bits —
    * keeps the hash non-negative on both engines). Undecodable or
    * too-short payloads come back `decoded = false` with a null hash. */
  def dhashAudio(df: DataFrame, bytesCol: String, idCol: String,
      segments: Int = 64): DataFrame = {
    require(segments >= 2 && segments <= 64,
      s"segments must be in 2..64: $segments")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          audioDhashOne(bytes, segments) match {
            case Some(h) => (id, Some(h), true)
            case None => (id, Option.empty[Long], false)
          }
        }
      }
      .toDF("id", "ahash", "decoded")
  }

  private[operators] def audioDhashOne(bytes: Array[Byte], segments: Int): Option[Long] = {
    var ais: javax.sound.sampled.AudioInputStream = null
    try {
      ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      // 16-bit signed little-endian mono PCM only (what the generators emit
      // and the overwhelmingly common archival layout); anything else is
      // "undecodable" for hashing purposes rather than silently wrong
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) return None
      val data = ais.readAllBytes()
      val n = data.length / 2
      if (n < segments) return None
      val per = n / segments // trailing remainder samples ignored
      val ms = new Array[Double](segments)
      var seg = 0
      while (seg < segments) {
        var sum = 0.0
        var i = seg * per
        val end = i + per
        while (i < end) {
          val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toDouble
          sum += s * s
          i += 1
        }
        ms(seg) = sum / per
        seg += 1
      }
      var hash = 0L
      var j = 0
      while (j < segments - 1) {
        if (ms(j + 1) > ms(j)) hash |= 1L << j
        j += 1
      }
      Some(hash)
    } catch { case _: Exception => None }
    finally if (ais != null) { try ais.close() catch { case _: Exception => } }
  }

  /** REAL audio decode + feature extraction via `javax.sound.sampled`
    * (WAV/AIFF/AU with PCM payloads — the JVM's built-in readers): payload
    * bytes → (sample rate, channels, duration, RMS level normalized to
    * [0, 1]). Same per-partition batched shape as [[decodeImages]];
    * undecodable payloads come back `decoded = false` with null metrics. */
  def decodeAudio(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          decodeAudioOne(bytes) match {
            case Some((rate, ch, ms, rms)) => (id, Some(rate), Some(ch), Some(ms), Some(rms), true)
            case None => (id, Option.empty[Int], Option.empty[Int],
              Option.empty[Long], Option.empty[Double], false)
          }
        }
      }
      .toDF("id", "sample_rate", "channels", "duration_ms", "rms", "decoded")
  }

  private[operators] def decodeAudioOne(
      bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    var ais: javax.sound.sampled.AudioInputStream = null
    try {
      ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) return None // PCM16 only
      val frames = ais.getFrameLength
      val data = ais.readAllBytes()
      val bigEndian = fmt.isBigEndian
      val ch = fmt.getChannels
      var sumSq = 0.0
      var i = 0
      val n = data.length / 2
      while (i < n) {
        val lo = if (bigEndian) data(2 * i + 1) else data(2 * i)
        val hi = if (bigEndian) data(2 * i) else data(2 * i + 1)
        val s = ((hi.toInt << 8) | (lo.toInt & 0xff)).toShort.toDouble / 32768.0
        sumSq += s * s
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      val ms = (frames * 1000.0 / fmt.getSampleRate).toLong
      Some((fmt.getSampleRate.toInt, ch, ms, rms))
    } catch { case _: Exception => None }
    finally if (ais != null) { try ais.close() catch { case _: Exception => } }
  }

  /** Decode one payload: mean-pooled g×g luminance grid (g = ⌈√dim⌉),
    * normalized to [0, 1], truncated to `dim` values. */
  private[operators] def decodeOne(bytes: Array[Byte], dim: Int): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val g = math.ceil(math.sqrt(dim.toDouble)).toInt
        val sums = new Array[Double](g * g)
        val counts = new Array[Long](g * g)
        var y = 0
        while (y < h) {
          val gy = y * g / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            val cell = gy * g + (x * g / w)
            sums(cell) += lum
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feats = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          feats(i) = if (i < g * g && counts(i) > 0) (sums(i) / counts(i) / 255.0).toFloat else 0f
          i += 1
        }
        Some((w, h, feats))
      }
    } catch { case _: Exception => None }

  /** Deterministic fake feature vector from payload bytes (FNV-1a seeded). */
  private[operators] def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 1099511628211L; i += 1 }
    val out = new Array[Float](dim)
    var k = 0
    var s = h
    while (k < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(k) = ((s >>> 40).toInt / 16777216.0f) - 0.5f
      k += 1
    }
    out
  }

  /** Frame-sampling stub for video-like payloads: emit `n` (frame_index,
    * frame_bytes) rows per media row — the explode shape a real frame
    * sampler produces. Frame bytes are slices of the payload (fake). */
  def sampleFrames(df: DataFrame, bytesCol: String, n: Int): DataFrame = {
    require(n >= 1, s"frame count must be >= 1, got $n") // sequence(0, -1) would count down
    df.withColumn("frame_index", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes", expr(s"substring($bytesCol, frame_index * 8 + 1, 8)"))
  }

  /** Deterministic multi-frame "video" synthesizer: one animated GIF per
    * row (a real multi-frame container the JVM writes and reads natively)
    * with `frames` uniform-gray frames whose gray level is a pure function
    * of (row id, frame index): `(id * 7 + frame * 13) % 256`. */
  def withGeneratedGif(df: DataFrame, idCol: String, frames: Int,
      width: Int = 16, height: Int = 16): DataFrame = {
    require(frames >= 1 && width >= 1 && height >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val out = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          writer.setOutput(out)
          writer.prepareWriteSequence(null)
          var fi = 0
          while (fi < frames) {
            val g = ((id * 7 + fi * 13) % 256).toInt
            val img = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (g << 16) | (g << 8) | g
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            fi += 1
          }
          writer.endWriteSequence()
          writer.dispose()
          out.close()
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** Deterministic MP4 synthesizer: one progressive MP4/QuickTime file per
    * row ([[graft.io.IsoBmff.muxVideo]]) whose video track holds `frames`
    * uniform-gray PNG-codec samples (gray = pure function of row + frame
    * index, so content is externally predictable and losslessly
    * recoverable). The video twin of [[withGeneratedPng]]. */
  def withGeneratedMp4(df: DataFrame, idCol: String, frames: Int = 4,
      width: Int = 16, height: Int = 16): DataFrame = {
    require(frames >= 1, s"frames must be >= 1: $frames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { id =>
          val pngs = (0 until frames).map { fi =>
            val g = ((id * 11 + fi * 17) % 256).toInt
            val img = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (g << 16) | (g << 8) | g
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          (id, graft.io.IsoBmff.muxVideo(pngs, "png ", width, height))
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** Deterministic Motion-JPEG MP4 synthesizer: like [[withGeneratedMp4]]
    * but every video sample is a REAL JPEG bitstream (JVM JPEG encoder)
    * under the QuickTime `jpeg` (Motion-JPEG) sample entry — the oldest
    * compressed-video codec an MP4 can carry and the one decodable with
    * the JVM alone. JPEG is lossy in general, but a UNIFORM gray frame
    * survives exactly: the level-shifted 8×8 blocks are DC-only, the
    * chroma planes are zero, and the DC quantizer divides the coefficient
    * without remainder at the encoder's default quality — verified
    * exhaustively for all 256 gray levels in MultimodalSpec. That makes
    * frame content oracle-predictable through a genuinely lossy codec. */
  def withGeneratedMjpegMp4(df: DataFrame, idCol: String, frames: Int = 4,
      width: Int = 16, height: Int = 16): DataFrame = {
    require(frames >= 1, s"frames must be >= 1: $frames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"))
      .as[Long]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { id =>
          val jpegs = (0 until frames).map { fi =>
            val g = ((id * 11 + fi * 17) % 256).toInt
            val img = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (g << 16) | (g << 8) | g
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            bos.toByteArray
          }
          (id, graft.io.IsoBmff.muxVideo(jpegs, "jpeg", width, height))
        }
      }
      .toDF(idCol, "media_bytes")
  }

  /** REAL MP4 frame extraction: demux the ISO BMFF container
    * ([[graft.io.IsoBmff.demuxVideo]] — real box/sample-table parsing),
    * decode every `stride`-th video sample with the JVM image reader
    * (QuickTime `png `/`jpeg` codecs store complete images per sample),
    * and emit one row per sampled frame with the container codec, frame
    * dimensions and mean luminance in [0, 1]. Same per-partition batched
    * shape as [[sampleFramesReal]]; non-BMFF payloads, missing video
    * tracks and undecodable samples yield a single `decoded = false` row. */
  def sampleFramesMp4(df: DataFrame, bytesCol: String, idCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          val frames = graft.io.IsoBmff.demuxVideo(bytes).flatMap { track =>
            val sampled = (0 until track.samples.size by stride).map { fi =>
              luminanceOf(track.samples(fi)).map { case (w, h, lum) =>
                (id, track.codec, fi, Some(w), Some(h), Some(lum), true)
              }
            }
            // a single undecodable sample marks the whole payload corrupt
            if (sampled.forall(_.isDefined)) Some(sampled.map(_.get)) else None
          }
          frames.getOrElse(Seq((id, null.asInstanceOf[String], -1,
            Option.empty[Int], Option.empty[Int], Option.empty[Double], false)))
        }
      }
      .toDF("id", "codec", "frame_index", "width", "height", "mean_luminance", "decoded")
  }

  /** Decode one image sample and return (width, height, mean luminance in
    * [0,1]); None when no JVM reader accepts the bytes. */
  private def luminanceOf(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, sum / (w.toLong * h) / 255.0))
      }
    } catch { case _: Exception => None }

  /** REAL frame extraction from multi-frame containers (animated GIF via
    * the JVM's reader): decode every `stride`-th frame and emit one row per
    * sampled frame with its dimensions and mean luminance in [0, 1] — the
    * real form of [[sampleFrames]], same explode shape, actual decoded
    * pixels. Undecodable payloads yield a single `decoded = false` row. */
  def sampleFramesReal(df: DataFrame, bytesCol: String, idCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          decodeFrames(bytes, stride) match {
            case Some(frames) => frames.map { case (fi, w, h, lum) =>
              (id, fi, Some(w), Some(h), Some(lum), true)
            }
            case None => Seq((id, -1, Option.empty[Int], Option.empty[Int],
              Option.empty[Double], false))
          }
        }
      }
      .toDF("id", "frame_index", "width", "height", "mean_luminance", "decoded")
  }

  private[operators] def decodeFrames(bytes: Array[Byte],
      stride: Int): Option[Seq[(Int, Int, Int, Double)]] = {
    // stream + reader are closed on EVERY path (corrupt-media rows are the
    // common case this operator must survive; leaking a native buffer per
    // bad row would build memory pressure in long-running executors)
    var in: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(in)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      val out = (0 until n by stride).map { fi =>
        val img = reader.read(fi)
        val w = img.getWidth; val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (fi, w, h, sum / (w.toLong * h) / 255.0)
      }
      Some(out)
    } catch { case _: Exception => None }
    finally {
      if (reader != null) reader.dispose()
      if (in != null) try in.close() catch { case _: Exception => }
    }
  }

  /** Partition-size guidance for binary columns: target ≤ `targetMB` of
    * payload per partition so decode stages never hold more than one
    * batch's worth of frames in memory. */
  def repartitionForMedia(df: DataFrame, bytesCol: String, targetMB: Int = 64): DataFrame = {
    val row = df.agg(sum(length(col(bytesCol)))).head()
    val totalBytes = if (row.isNullAt(0)) 0L else row.getLong(0) // empty frame → NULL sum
    val targetBytes = targetMB * 1024L * 1024L
    // ceil, not floor: floor would leave partitions up to 2× the target
    val parts = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    df.repartition(parts)
  }
}

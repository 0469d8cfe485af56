package graft.io

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal ISO Base Media File Format (MP4/QuickTime) video muxer and
  * demuxer — pure JVM, no codec libraries.
  *
  * Structure per ISO/IEC 14496-12 (public spec): a file is a tree of
  * length-prefixed boxes; video sample payloads live in `mdat`, and the
  * `moov/trak/mdia/minf/stbl` sample tables (`stsd` codec entry, `stsz`
  * sizes, `stsc` sample-to-chunk runs, `stco`/`co64` chunk offsets) map
  * samples to absolute file offsets.
  *
  * The muxer writes one video track whose sample entry is the QuickTime
  * `png ` codec (each sample is a complete PNG image — lossless, so frame
  * content is bit-exactly recoverable; ffmpeg/QuickTime read this layout).
  * The demuxer walks the real box tree: it selects the `vide`-handler
  * track, resolves every sample's offset from the stsc/stco/stsz tables,
  * and returns the codec fourcc plus the raw sample payloads. It handles
  * 64-bit `co64` offsets, uniform `stsz` sizes and multi-run `stsc` —
  * enough to demux any single-video-track progressive file of this family.
  */
object IsoBmff {

  // ------------------------------------------------------------------ mux

  /** Mux `frames` (already-encoded images, one per video sample) into a
    * progressive MP4/QuickTime file: `ftyp` + `mdat` + `moov`, one video
    * track, one chunk holding all samples, constant frame duration. */
  def muxVideo(frames: Seq[Array[Byte]], codecFourcc: String = "png ",
      width: Int, height: Int, timescale: Int = 30): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame required")
    require(codecFourcc.length == 4, s"fourcc must be 4 chars: '$codecFourcc'")
    val ftyp = box("ftyp", bytes("qt  "), be32(0), bytes("qt  "))
    val mdatPayloadOffset = ftyp.length + 8L // first sample's absolute offset
    val mdat = box("mdat", frames.toArray: _*)
    val n = frames.size
    val duration = n // timescale units: 1 per frame at `timescale` fps

    val stsd = fullBox("stsd", 0, 0, be32(1), visualSampleEntry(codecFourcc, width, height))
    val stts = fullBox("stts", 0, 0, be32(1), be32(n), be32(1))
    val stsc = fullBox("stsc", 0, 0, be32(1), be32(1), be32(n), be32(1))
    val stsz = fullBox("stsz", 0, 0, be32(0), be32(n),
      concatArrays(frames.map(f => be32(f.length))))
    val stco = fullBox("stco", 0, 0, be32(1), be32(mdatPayloadOffset.toInt))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0))
    val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
    val dinf = box("dinf", dref)
    val minf = box("minf", vmhd, dinf, stbl)
    val hdlr = fullBox("hdlr", 0, 0, be32(0), bytes("vide"),
      be32(0), be32(0), be32(0), Array[Byte](0))
    val mdhd = fullBox("mdhd", 0, 0, be32(0), be32(0), be32(timescale),
      be32(duration), be16(0x55c4), be16(0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = fullBox("tkhd", 0, 7, be32(0), be32(0), be32(1), be32(0),
      be32(duration), be32(0), be32(0), be16(0), be16(0), be16(0), be16(0),
      identityMatrix, be32(width << 16), be32(height << 16))
    val trak = box("trak", tkhd, mdia)
    val mvhd = fullBox("mvhd", 0, 0, be32(0), be32(0), be32(timescale),
      be32(duration), be32(0x00010000), be16(0x0100), be16(0),
      be32(0), be32(0), identityMatrix,
      be32(0), be32(0), be32(0), be32(0), be32(0), be32(0), be32(2))
    val moov = box("moov", mvhd, trak)
    concatArrays(Seq(ftyp, mdat, moov))
  }

  /** One demuxed video track: codec fourcc and raw sample payloads in
    * presentation order. */
  final case class VideoTrack(codec: String, samples: Seq[Array[Byte]])

  // ---------------------------------------------------------------- demux

  /** Demux the first video (`vide`-handler) track, or None when the bytes
    * are not a BMFF file / hold no video track / have corrupt tables. */
  def demuxVideo(file: Array[Byte]): Option[VideoTrack] =
    try {
      val moov = childRanges(file, 0, file.length).collectFirst {
        case ("moov", s, e) => (s, e)
      }
      moov.flatMap { case (ms, me) =>
        childRanges(file, ms, me).collect { case ("trak", s, e) => (s, e) }
          .flatMap { case (ts, te) => demuxTrack(file, ts, te) }
          .headOption
      }
    } catch { case _: Exception => None }

  private def demuxTrack(file: Array[Byte], ts: Int, te: Int): Option[VideoTrack] = {
    val mdia = range(file, ts, te, "mdia").getOrElse(return None)
    val handler = range(file, mdia._1, mdia._2, "hdlr").map { case (s, _) =>
      new String(file, s + 8, 4, StandardCharsets.ISO_8859_1)
    }
    if (!handler.contains("vide")) return None
    val minf = range(file, mdia._1, mdia._2, "minf").getOrElse(return None)
    val stbl = range(file, minf._1, minf._2, "stbl").getOrElse(return None)
    val tables = childRanges(file, stbl._1, stbl._2).toMap0

    // stsd: full-box header(4) + entry_count(4), first entry: size(4)+fourcc(4)
    val codec = tables.get("stsd").map { case (s, _) =>
      new String(file, s + 12, 4, StandardCharsets.ISO_8859_1)
    }.getOrElse(return None)

    // stsz: uniform size or per-sample list
    val sizes = tables.get("stsz").map { case (s, _) =>
      val b = buf(file, s)
      b.getInt // version/flags
      val sampleSize = b.getInt
      val count = b.getInt
      if (sampleSize != 0) Array.fill(count)(sampleSize)
      else Array.fill(count)(b.getInt)
    }.getOrElse(return None)
    val n = sizes.length

    // chunk offsets: stco (32-bit) or co64
    val chunkOffsets: Array[Long] = tables.get("stco").map { case (s, _) =>
      val b = buf(file, s); b.getInt
      Array.fill(b.getInt)(b.getInt.toLong & 0xffffffffL)
    }.orElse(tables.get("co64").map { case (s, _) =>
      val b = buf(file, s); b.getInt
      Array.fill(b.getInt)(b.getLong)
    }).getOrElse(return None)

    // stsc runs: (first_chunk, samples_per_chunk) — expand to per-sample
    // chunk assignment, then accumulate within-chunk offsets from sizes
    val stscRuns = tables.get("stsc").map { case (s, _) =>
      val b = buf(file, s); b.getInt
      Array.fill(b.getInt) {
        val first = b.getInt; val per = b.getInt; b.getInt // desc index
        (first, per)
      }
    }.getOrElse(return None)

    val samples = Vector.newBuilder[Array[Byte]]
    var sample = 0
    var run = 0
    var chunk = 1
    while (sample < n && chunk <= chunkOffsets.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
      val perChunk = stscRuns(run)._2
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < perChunk && sample < n) {
        val sz = sizes(sample)
        if (off + sz > file.length) return None // corrupt table
        samples += java.util.Arrays.copyOfRange(file, off.toInt, (off + sz).toInt)
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < n) return None
    Some(VideoTrack(codec, samples.result()))
  }

  // --------------------------------------------------------- box plumbing

  /** (type, payloadStart, payloadEnd) for each box directly inside
    * [start, end). Tolerates 64-bit largesize and size-0 (to-end) boxes. */
  private def childRanges(file: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Vector.newBuilder[(String, Int, Int)]
    var p = start
    while (p + 8 <= end) {
      val b = ByteBuffer.wrap(file, p, end - p)
      val size32 = b.getInt.toLong & 0xffffffffL
      val tp = new String(file, p + 4, 4, StandardCharsets.ISO_8859_1)
      val (size, headerLen) =
        if (size32 == 1 && p + 16 <= end) (ByteBuffer.wrap(file, p + 8, 8).getLong, 16)
        else if (size32 == 0) ((end - p).toLong, 8)
        else (size32, 8)
      if (size < headerLen || p + size > end) return out.result() // corrupt tail
      out += ((tp, p + headerLen, (p + size).toInt))
      p += size.toInt
    }
    out.result()
  }

  private def range(file: Array[Byte], start: Int, end: Int,
      tp: String): Option[(Int, Int)] =
    childRanges(file, start, end).collectFirst { case (`tp`, s, e) => (s, e) }

  private implicit class FirstWins(val rs: Seq[(String, Int, Int)]) extends AnyVal {
    /** first box of each type wins (sample tables are unique per stbl) */
    def toMap0: Map[String, (Int, Int)] =
      rs.foldLeft(Map.empty[String, (Int, Int)]) { case (m, (t, s, e)) =>
        if (m.contains(t)) m else m.updated(t, (s, e))
      }
  }

  private def buf(file: Array[Byte], at: Int): ByteBuffer =
    ByteBuffer.wrap(file, at, file.length - at)

  private def box(tp: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = concatArrays(parts)
    val out = ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length)
    out.put(tp.getBytes(StandardCharsets.ISO_8859_1))
    out.put(payload)
    out.array()
  }

  private def fullBox(tp: String, version: Int, flags: Int,
      parts: Array[Byte]*): Array[Byte] =
    box(tp, (be32((version << 24) | flags) +: parts): _*)

  /** VisualSampleEntry (14496-12 §12.1.3): the codec box inside stsd. */
  private def visualSampleEntry(fourcc: String, width: Int, height: Int): Array[Byte] = {
    val body = concatArrays(Seq(
      new Array[Byte](6), be16(1),            // reserved, data_reference_index
      be16(0), be16(0), new Array[Byte](12),  // pre_defined / reserved
      be16(width), be16(height),
      be32(0x00480000), be32(0x00480000),     // 72 dpi horiz/vert
      be32(0), be16(1),                       // reserved, frame_count
      new Array[Byte](32),                    // compressorname (pascal, empty)
      be16(24), be16(0xffff)))                // depth, pre_defined(-1)
    val out = ByteBuffer.allocate(8 + body.length)
    out.putInt(8 + body.length)
    out.put(fourcc.getBytes(StandardCharsets.ISO_8859_1))
    out.put(body)
    out.array()
  }

  private val identityMatrix: Array[Byte] = concatArrays(Seq(
    be32(0x00010000), be32(0), be32(0),
    be32(0), be32(0x00010000), be32(0),
    be32(0), be32(0), be32(0x40000000)))

  private def be32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
  private def be16(v: Int): Array[Byte] =
    Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)

  private def concatArrays(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var p = 0
    parts.foreach { a => System.arraycopy(a, 0, out, p, a.length); p += a.length }
    out
  }
}

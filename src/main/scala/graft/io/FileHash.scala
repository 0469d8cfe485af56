package graft.io

import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

/** File byte-identity checks (SURVEY §2.11 C2; reference
  * /root/reference/parq_tools/utils/hash_utils.py:25-69).
  *
  * `hashMethod` mirrors the reference's strategy plug-in: "fast" (size +
  * sampled-bytes check), "sha256", "xxhash" (XXH64 via Spark's
  * implementation), or a caller-supplied digest function.
  */
object FileHash {

  type Digest = InputStream => String

  def filesMatch(src: String, dst: String, hashMethod: String = "fast"): Boolean = {
    val s = Paths.get(src)
    val d = Paths.get(dst)
    if (!Files.exists(s)) throw new java.io.FileNotFoundException(s"Source file $src does not exist.")
    if (!Files.exists(d)) return false
    hashMethod match {
      case "fast"   => fastFileCheck(s, d)
      case "sha256" => digest(s, sha256) == digest(d, sha256)
      case "xxhash" => digest(s, xxh64) == digest(d, xxh64)
      case other => throw new IllegalArgumentException(s"Unknown hash_method: $other")
    }
  }

  def filesMatch(src: String, dst: String, hashMethod: Digest): Boolean = {
    val s = Paths.get(src)
    val d = Paths.get(dst)
    if (!Files.exists(s)) throw new java.io.FileNotFoundException(s"Source file $src does not exist.")
    Files.exists(d) && digest(s, hashMethod) == digest(d, hashMethod)
  }

  /** Size + sampled-byte comparison (head, middle, tail 4 KiB) — the cheap
    * screen before a full-content hash. */
  def fastFileCheck(a: Path, b: Path): Boolean = {
    val la = Files.size(a)
    if (la != Files.size(b)) return false
    if (la == 0) return true
    val sampleAt = Seq(0L, math.max(0L, la / 2 - 2048), math.max(0L, la - 4096)).distinct
    sampleAt.forall { off =>
      java.util.Arrays.equals(readAt(a, off, 4096), readAt(b, off, 4096))
    }
  }

  private def readAt(p: Path, offset: Long, len: Int): Array[Byte] = {
    val ch = Files.newByteChannel(p)
    try {
      ch.position(offset)
      val buf = java.nio.ByteBuffer.allocate(len)
      // a single read may legally return fewer bytes than requested — loop
      // until the buffer is full or EOF, or two equal files could compare
      // different-length samples
      var n = 0
      while (n >= 0 && buf.hasRemaining) n = ch.read(buf)
      java.util.Arrays.copyOf(buf.array(), buf.position())
    } finally ch.close()
  }

  val sha256: Digest = { in =>
    val md = MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](1024 * 1024)
    var n = in.read(buf)
    while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    md.digest().map("%02x".format(_)).mkString
  }

  val xxh64: Digest = { in =>
    // streaming XXH64 over 1 MiB blocks, combined pairwise — stable digest
    // built on Spark's XXH64 primitive
    val buf = new Array[Byte](1024 * 1024)
    var acc = 42L
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, n, 42L)
        acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, acc)
      }
      n = in.read(buf)
    }
    java.lang.Long.toHexString(acc)
  }

  def digest(p: Path, d: Digest): String = {
    val in = new BufferedInputStream(new FileInputStream(p.toFile))
    try d(in) finally in.close()
  }
}

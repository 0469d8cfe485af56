package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Persisted "seen-keys" bloom filter: a single-file JSON sidecar holding a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] plus the build
  * spec it was sized with.
  *
  * This is the membership half of incremental corpus admission
  * (reference contract: `parq_tools/utils/dedup.py`'s persisted-state idea,
  * generalized): a daily batch asks "which of my keys has the 100 TB
  * history DEFINITELY never seen?" without shuffling the history. The
  * bloom has no false negatives, so a negative probe admits a row with
  * zero history-side work; positives (true dups + ~fpp false alarms) are
  * the only rows that pay an exact anti-join.
  *
  * Spec round-trip: `expectedItems`/`numBits` are stored so later batches
  * can build a merge-compatible filter (`mergeInPlace` requires identical
  * bit size and hash count, both pure functions of these two numbers).
  *
  * Crash consistency mirrors [[AnnSidecar]]: everything rides one JSON file
  * published with an atomic replacing move on the local FS (temp + rename
  * elsewhere, keeping a completed tmp on rename failure). The bloom bytes
  * are base64 inside the JSON — one file means no torn multi-file states.
  * Size envelope: ~1.2 MB per million expected items at 3% fpp (×4/3 for
  * base64); at the ~100 M-key point where the literal would dominate task
  * deserialization, shard the corpus by key range and keep one sidecar per
  * shard instead of inflating a single filter.
  */
object BloomSidecar {

  val FileName = "_graft_seen_bloom.json"

  /** The persisted spec + filter. `itemsAdded` is the cumulative count of
    * rows fed through build/merge — an upper bound on distinct keys, kept
    * so operators can warn when the filter is loaded past its sizing (fpp
    * degrades smoothly but monotonically beyond `expectedItems`). */
  final case class Meta(
      expectedItems: Long,
      numBits: Long,
      fpp: Double,
      itemsAdded: Long,
      filter: BloomFilter) {

    def bytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      filter.writeTo(bos)
      bos.toByteArray
    }
  }

  private def mapper = new ObjectMapper()

  /** Publish the sidecar at `dir/`[[FileName]] (atomic replace). */
  def write(spark: SparkSession, dir: String, meta: Meta): Unit = {
    val root = mapper.createObjectNode()
    root.put("kind", "seen_bloom")
    root.put("expected_items", meta.expectedItems)
    root.put("num_bits", meta.numBits)
    root.put("fpp", meta.fpp)
    root.put("items_added", meta.itemsAdded)
    root.put("filter_b64",
      java.util.Base64.getEncoder.encodeToString(meta.bytes))
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)

    val fs = new Path(dir, FileName)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicFiles.publishAtomically(fs, dir, FileName, bytes)
  }

  /** Read the sidecar; None when absent. */
  def read(spark: SparkSession, dir: String): Option[Meta] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes =
      try {
        val bos = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    val root = mapper.readTree(bytes)
    require(root.path("kind").asText() == "seen_bloom",
      s"$p is not a seen-bloom sidecar (kind=${root.path("kind").asText()})")
    val filterBytes =
      java.util.Base64.getDecoder.decode(root.path("filter_b64").asText())
    Some(Meta(
      expectedItems = root.path("expected_items").asLong(),
      numBits = root.path("num_bits").asLong(),
      fpp = root.path("fpp").asDouble(),
      itemsAdded = root.path("items_added").asLong(),
      filter = BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))))
  }

  /** Read, failing loudly when the sidecar is missing. */
  def load(spark: SparkSession, dir: String): Meta =
    read(spark, dir).getOrElse(throw new IllegalStateException(
      s"no seen-bloom sidecar at $dir/$FileName — build one with " +
        "Dedup.writeSeenBloom before probing"))
}

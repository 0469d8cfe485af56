package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Self-describing stored ANN/cluster layouts: the centroid/codebook
  * arrays ARE the layout's contract (a probe run with different arrays
  * reads the wrong partitions and silently returns wrong neighbors), so
  * they are persisted WITH the table as a JSON sidecar (`_graft_ann.json`
  * beside the parquet partitions — the `_SUCCESS`/`_metadata` precedent)
  * instead of living in the caller's head. Loaders verify a caller's
  * arrays against the stored ones bit-for-bit (doubles round-trip through
  * Jackson's shortest-repr encoding) and can supply them outright.
  *
  * Control-plane data only: centroids and codebooks are
  * `numLists·dim + m·codes·sub` doubles — KB to low MB — never row data. */
object AnnSidecar {

  val FileName = "_graft_ann.json"

  // Layout + sidecar crash consistency: every write* operator overwrites
  // the parquet layout FIRST (Spark's static overwrite deletes the whole
  // directory — the old sidecar included) and writes the sidecar LAST. A
  // crash between the two leaves a layout with NO sidecar, so the
  // no-array overloads fail loudly ("no sidecar") instead of probing new
  // codes under stale arrays — re-running the write recovers. A stale
  // sidecar describing different codes cannot survive a completed
  // parquet overwrite.

  final case class Meta(
      kind: String, // "ivf" | "ivfpq" | "semdedup" | "pq"
      params: Map[String, Int],
      centroids: Array[Array[Double]],
      codebooks: Option[Array[Array[Array[Double]]]]) {

    def requireMatches(thatCentroids: Array[Array[Double]],
        thatCodebooks: Option[Array[Array[Array[Double]]]]): Unit = {
      def eq2(a: Array[Array[Double]], b: Array[Array[Double]]): Boolean =
        a.length == b.length && a.zip(b).forall { case (x, y) =>
          java.util.Arrays.equals(x, y) }
      require(eq2(centroids, thatCentroids),
        s"stored $kind layout was built with DIFFERENT centroids than the " +
          "ones passed — a probe against it would read the wrong partitions. " +
          "Load them via AnnSidecar.read / the no-array overloads, or rewrite " +
          "the layout.")
      (codebooks, thatCodebooks) match {
        case (Some(a), Some(b)) =>
          require(a.length == b.length && a.indices.forall(i => eq2(a(i), b(i))),
            s"stored $kind layout was built with DIFFERENT codebooks than " +
              "the ones passed — ADC distances against it would be garbage.")
        case (None, None) => ()
        case _ => throw new IllegalArgumentException(
          s"stored $kind layout codebook presence mismatch")
      }
    }
  }

  private def mapper = new ObjectMapper()

  /** Write the sidecar next to the layout's partition directories. */
  def write(spark: SparkSession, layoutPath: String, meta: Meta): Unit = {
    val root = mapper.createObjectNode()
    root.put("kind", meta.kind)
    val pn = root.putObject("params")
    meta.params.toSeq.sortBy(_._1).foreach { case (k, v) => pn.put(k, v) }
    putMatrix(root.putArray("centroids"), meta.centroids)
    meta.codebooks.foreach { cbs =>
      val arr = root.putArray("codebooks")
      cbs.foreach(cb => putMatrix(arr.addArray(), cb))
    }
    // crash-consistency contract (atomic replace, stale-.crc removal,
    // completed-tmp-kept-on-rename-failure) lives in AtomicFiles — one
    // implementation shared by every sidecar writer
    val fs = new Path(layoutPath, FileName)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    AtomicFiles.publishAtomically(fs, layoutPath, FileName, bytes)
  }

  /** Read the sidecar; None when the layout predates self-description. */
  def read(spark: SparkSession, layoutPath: String): Option[Meta] = {
    val p = new Path(layoutPath, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val root =
      try mapper.readTree(in)
      finally in.close()
    val params = {
      val it = root.path("params").fields()
      val b = Map.newBuilder[String, Int]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asInt() }
      b.result()
    }
    val cents = readMatrix(root.path("centroids"))
    val cbs =
      if (root.has("codebooks"))
        Some(root.path("codebooks").elements().asScalaArray(readMatrix))
      else None
    Some(Meta(root.path("kind").asText(), params, cents, cbs))
  }

  /** Load the sidecar or fail with a clear contract error — for the
    * overloads that OMIT the arrays and trust the layout. */
  def load(spark: SparkSession, layoutPath: String, kind: String): Meta = {
    val meta = read(spark, layoutPath).getOrElse(throw new IllegalStateException(
      s"no $FileName sidecar under $layoutPath — the layout predates " +
        "self-description; pass the centroid/codebook arrays explicitly " +
        "or rewrite it"))
    Predef.require(meta.kind == kind,
      s"layout at $layoutPath is '${meta.kind}', expected '$kind'")
    meta
  }

  /** Verify caller-passed arrays against the sidecar when one exists
    * (layouts written before self-description pass through unverified). */
  def verifyIfPresent(spark: SparkSession, layoutPath: String, kind: String,
      centroids: Array[Array[Double]],
      codebooks: Option[Array[Array[Array[Double]]]]): Unit =
    read(spark, layoutPath).foreach { meta =>
      Predef.require(meta.kind == kind,
        s"layout at $layoutPath is '${meta.kind}', expected '$kind'")
      meta.requireMatches(centroids, codebooks)
    }

  // ------------------------------------------------------------- helpers
  private def putMatrix(arr: ArrayNode, m: Array[Array[Double]]): Unit =
    m.foreach { row => val r = arr.addArray(); row.foreach(r.add) }

  private def readMatrix(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] =
    node.elements().asScalaArray(row =>
      row.elements().asScalaArray(_.asDouble()))

  private implicit final class IterOps(
      private val it: java.util.Iterator[com.fasterxml.jackson.databind.JsonNode]) {
    def asScalaArray[T: scala.reflect.ClassTag](
        f: com.fasterxml.jackson.databind.JsonNode => T): Array[T] = {
      val b = Array.newBuilder[T]
      while (it.hasNext) b += f(it.next())
      b.result()
    }
  }
}

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
    // temp + rename: a crash mid-write must not leave a torn JSON that
    // bricks every later probe of an otherwise-valid layout (the
    // AtomicFiles contract, spelled out on the Hadoop FS API)
    val p = new Path(layoutPath, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    if (fs.getScheme == "file") {
      // Local FS: publish with an ATOMIC replacing move — there is no
      // delete-then-rename window in which BOTH sidecars are absent (a
      // crash inside that window previously lost old and new at once, and
      // a concurrent reader saw an unverified layout). The whole write
      // rides java.nio, NOT the checksummed Hadoop LocalFileSystem — a nio
      // move under a Hadoop-created file would leave a stale .crc sidecar
      // that fails every later read; any legacy .crc is removed instead.
      val dir = java.nio.file.Paths.get(new Path(layoutPath).toUri.getPath)
      val target = dir.resolve(FileName)
      val tmpP = dir.resolve(s"$FileName.${java.util.UUID.randomUUID}.tmp")
      try java.nio.file.Files.write(tmpP, bytes)
      catch { // only an INCOMPLETE tmp is ever deleted
        case e: Throwable =>
          java.nio.file.Files.deleteIfExists(tmpP); throw e
      }
      try java.nio.file.Files.move(tmpP, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmpP, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      java.nio.file.Files.deleteIfExists(dir.resolve(s".$FileName.crc"))
    } else {
      // Remote FS without atomic replace: delete + rename. If the rename
      // fails the COMPLETED tmp is kept and named so the layout stays
      // recoverable (the AtomicFiles.atomicOutputDir precedent).
      val tmp = new Path(layoutPath, s"$FileName.${java.util.UUID.randomUUID}.tmp")
      try {
        val out = fs.create(tmp, true)
        try out.write(bytes)
        finally out.close()
      } catch {
        case e: Throwable => fs.delete(tmp, false); throw e
      }
      fs.delete(p, false) // rename does not overwrite on Hadoop FSs
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(
          s"rename $tmp -> $p failed; the completed sidecar was KEPT at " +
            s"$tmp — move it into place or re-run write")
    }
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

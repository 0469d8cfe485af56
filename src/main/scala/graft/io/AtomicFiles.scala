package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Atomic local-filesystem write/copy utilities (SURVEY §2.11; reference
  * /root/reference/parq_tools/utils/file_utils.py:16-154 —
  * `atomic_output_file`, `atomic_output_dir`, `atomic_file_copy`).
  *
  * All writes go to a sibling temp path in the SAME directory (same
  * filesystem — `Files.move(..., ATOMIC_MOVE)` is then a rename, the only
  * atomic primitive local filesystems give us), and the temp is deleted on
  * any failure: a reader never observes a partial file at the final path.
  * This is the local-pipeline analogue of [[ParquetIO]]'s
  * `_SUCCESS`-gated directory sink — used for sidecar artifacts, single
  * parquet files and config drops, not for distributed table writes. */
object AtomicFiles {

  /** Run `write` against a temp sibling of `finalFile`, then atomically
    * rename over `finalFile`. On any exception the temp file is removed
    * and the exception rethrown — `finalFile` is either its previous
    * content or the complete new content, never a torn write. The temp
    * name carries a per-call random component (mkstemp pattern): two
    * concurrent writers race only on WHICH complete file wins the final
    * rename, never on a shared temp they could tear. */
  def atomicOutputFile[T](finalFile: Path, suffix: String = ".tmp")(
      write: Path => T): T = {
    val tmp = finalFile.resolveSibling(
      s"${finalFile.getFileName}.${java.util.UUID.randomUUID}$suffix")
    try {
      val r = write(tmp)
      Files.move(tmp, finalFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      r
    } catch {
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
  }

  /** Directory form: `write` fills a unique temp sibling directory;
    * success swaps it in (removing any previous `finalDir`), a failure
    * DURING `write` removes the temp tree. The swap itself is a rename —
    * atomic on one filesystem — though removing a pre-existing target
    * first makes the PAIR non-atomic for concurrent readers (the
    * reference's `atomic_output_dir` has the same window;
    * file_utils.py:45-77). A failure AFTER `write` completed (while
    * removing the old tree or renaming) deliberately KEEPS the finished
    * temp tree and names it in the rethrown exception: at that point the
    * old directory may already be partially gone, and deleting the only
    * complete copy too would turn a recoverable fault into data loss. */
  def atomicOutputDir[T](finalDir: Path, suffix: String = ".tmp")(
      write: Path => T): T = {
    val tmp = finalDir.resolveSibling(
      s"${finalDir.getFileName}.${java.util.UUID.randomUUID}$suffix")
    Files.createDirectories(tmp)
    val r =
      try write(tmp)
      catch { case e: Throwable => deleteRecursively(tmp); throw e }
    try {
      deleteRecursively(finalDir)
      Files.move(tmp, finalDir, StandardCopyOption.ATOMIC_MOVE)
      r
    } catch {
      case e: Throwable =>
        throw new java.io.IOException(
          s"swap into $finalDir failed after a complete write; the finished " +
            s"tree is preserved at $tmp for manual recovery", e)
    }
  }

  /** Chunked copy + hash verify + atomic replace (reference
    * `atomic_file_copy`, file_utils.py:80-154). If `dst` is a directory
    * the source file name is appended. Unless `force`, an existing `dst`
    * that already matches under `hashMethod` short-circuits (no copy). The
    * copy lands in a temp sibling, is verified against `src` BEFORE the
    * rename (a corrupt temp never reaches `dst`), then atomically
    * replaces `dst`. Returns the final destination path. */
  def atomicFileCopy(src: Path, dstIn: Path, hashMethod: String = "sha256",
      force: Boolean = false): Path = {
    if (!Files.exists(src))
      throw new java.io.FileNotFoundException(s"Source file $src does not exist.")
    val dst =
      if (Files.isDirectory(dstIn)) dstIn.resolve(src.getFileName) else dstIn
    if (!force && FileHash.filesMatch(src.toString, dst.toString, hashMethod))
      return dst
    atomicOutputFile(dst) { tmp =>
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
      if (!FileHash.filesMatch(src.toString, tmp.toString, hashMethod))
        throw new RuntimeException(
          s"$hashMethod mismatch after copy: $src -> $dst")
    }
    dst
  }

  /** Convenience overload on string paths. */
  def atomicFileCopy(src: String, dst: String): Path =
    atomicFileCopy(Paths.get(src), Paths.get(dst))

  /** Publish `bytes` as `dir/fileName` with atomic-replace semantics on
    * any Hadoop filesystem — the one implementation behind every sidecar
    * artifact ([[AnnSidecar]], [[BloomSidecar]]); the crash-consistency
    * rules live HERE so they cannot drift between writers.
    *
    *  - Local FS: java.nio end-to-end (temp write + `ATOMIC_MOVE` replace;
    *    falls back to a plain replacing move where the FS lacks atomic
    *    moves). There is NO delete-then-rename window in which both old
    *    and new file are absent. Any legacy Hadoop `.crc` checksum for the
    *    target is removed — a nio move under a Hadoop-created file would
    *    otherwise leave a stale `.crc` that fails every checksummed read.
    *  - Remote FS (no atomic replace in the Hadoop API): temp write, then
    *    delete + rename. Only an INCOMPLETE temp is ever deleted; if the
    *    final rename fails the COMPLETED temp is kept and named in the
    *    thrown exception so the artifact stays recoverable. */
  def publishAtomically(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      fileName: String, bytes: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, fileName)
    if (fs.getScheme == "file") {
      val d = Paths.get(new org.apache.hadoop.fs.Path(dir).toUri.getPath)
      Files.createDirectories(d)
      val target = d.resolve(fileName)
      val tmp = d.resolve(s"$fileName.${java.util.UUID.randomUUID}.tmp")
      try Files.write(tmp, bytes)
      catch { // only an INCOMPLETE tmp is ever deleted
        case e: Throwable => Files.deleteIfExists(tmp); throw e
      }
      try Files.move(tmp, target,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
      }
      Files.deleteIfExists(d.resolve(s".$fileName.crc"))
    } else {
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s"$fileName.${java.util.UUID.randomUUID}.tmp")
      try {
        val out = fs.create(tmp, true)
        try out.write(bytes)
        finally out.close()
      } catch {
        case e: Throwable => fs.delete(tmp, false); throw e
      }
      fs.delete(p, false) // Hadoop rename does not overwrite
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(
          s"rename $tmp -> $p failed; the completed artifact was KEPT at " +
            s"$tmp — move it into place or re-run write")
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively) finally children.close()
      }
      Files.delete(p)
    }
  }
}

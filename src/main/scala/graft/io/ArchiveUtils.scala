package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** Archive extraction (SURVEY §2.1 S6; reference
  * /root/reference/parq_tools/utils/archive_utils.py:12-54 — zip first, 7z
  * fallback). Zip rides the JVM standard library; 7z rides commons-compress
  * (already on Spark's classpath). Not a query operator — a dataset-staging
  * utility.
  */
object ArchiveUtils {

  /** Extract an archive into `outDir` (created if missing): tries zip, falls
    * back to 7z — the reference's order (archive_utils.py:29-55). Rejects
    * entries escaping the target directory (zip-slip). Returns extracted
    * paths. */
  def extractArchive(archive: String, outDir: String): Seq[Path] = {
    val arc = Paths.get(archive)
    if (!Files.exists(arc)) throw new java.io.FileNotFoundException(archive)
    try extractZip(archive, outDir)
    catch {
      case _: java.util.zip.ZipException | _: java.io.EOFException =>
        extract7z(archive, outDir)
    }
  }

  private def extractZip(archive: String, outDir: String): Seq[Path] = {
    val arc = Paths.get(archive)
    val target = Paths.get(outDir)
    Files.createDirectories(target)
    val extracted = Seq.newBuilder[Path]
    val zin = new ZipInputStream(Files.newInputStream(arc))
    try {
      var e = zin.getNextEntry
      if (e == null)
        // not a zip container at all (7z, tar, garbage) → trigger fallback
        throw new java.util.zip.ZipException(s"no zip entries in $archive")
      while (e != null) {
        val dest = target.resolve(e.getName).normalize()
        if (!dest.startsWith(target.normalize()))
          throw new SecurityException(s"Archive entry escapes target dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(dest)
        else {
          Files.createDirectories(dest.getParent)
          val out = new BufferedOutputStream(new FileOutputStream(dest.toFile))
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = zin.read(buf)
            while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = zin.read(buf) }
          } finally out.close()
          extracted += dest
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    extracted.result()
  }

  /** 7z fallback via commons-compress (reference
    * archive_utils.py:58-100 shells out to the 7-Zip binary; the JVM path
    * needs no external process). */
  private def extract7z(archive: String, outDir: String): Seq[Path] = {
    import org.apache.commons.compress.archivers.sevenz.SevenZFile
    val target = Paths.get(outDir)
    Files.createDirectories(target)
    val extracted = Seq.newBuilder[Path]
    val sz = SevenZFile.builder().setFile(Paths.get(archive).toFile).get()
    try {
      var e = sz.getNextEntry
      while (e != null) {
        val dest = target.resolve(e.getName).normalize()
        if (!dest.startsWith(target.normalize()))
          throw new SecurityException(s"Archive entry escapes target dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(dest)
        else {
          Files.createDirectories(dest.getParent)
          val out = new BufferedOutputStream(new FileOutputStream(dest.toFile))
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = sz.read(buf)
            while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = sz.read(buf) }
          } finally out.close()
          extracted += dest
        }
        e = sz.getNextEntry
      }
    } finally sz.close()
    extracted.result()
  }
}

package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** Archive extraction (SURVEY §2.1 S6; reference
  * /root/reference/parq_tools/utils/archive_utils.py:12-54 — zip with a 7z
  * fallback). The JVM standard library covers zip; other formats raise
  * (the reference's 7z path needs an external library we deliberately do
  * not depend on). Not a query operator — a dataset-staging utility.
  */
object ArchiveUtils {

  /** Extract a .zip archive into `outDir` (created if missing). Rejects
    * entries escaping the target directory (zip-slip). Returns extracted
    * paths. */
  def extractArchive(archive: String, outDir: String): Seq[Path] = {
    val arc = Paths.get(archive)
    if (!Files.exists(arc)) throw new java.io.FileNotFoundException(archive)
    if (!archive.toLowerCase.endsWith(".zip"))
      throw new UnsupportedOperationException(
        s"Only .zip archives are supported (got: $archive)")
    val target = Paths.get(outDir)
    Files.createDirectories(target)
    val extracted = Seq.newBuilder[Path]
    val zin = new ZipInputStream(Files.newInputStream(arc))
    try {
      var e = zin.getNextEntry
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
}

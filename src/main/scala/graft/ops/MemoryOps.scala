package graft.ops

import org.apache.spark.sql.SparkSession

import graft.io.ParquetIO

/** Per-column size accounting from Parquet footers (SURVEY §2.4 A5; reference
  * /root/reference/parq_tools/utils/memory_utils.py:5-117).
  *
  * The reference samples chunks and scales linearly to estimate in-memory
  * size; Parquet footers carry *exact* compressed and uncompressed byte
  * counts per column chunk, so we report those instead — exact, and free (no
  * data read).
  */
object MemoryOps {

  final case class ColumnMemory(
      column: String,
      compressedBytes: Long,
      uncompressedBytes: Long,
      numValues: Long)

  final case class MemoryReport(
      path: String,
      numRows: Long,
      numRowGroups: Int,
      totalCompressedBytes: Long,
      totalUncompressedBytes: Long,
      columns: Seq[ColumnMemory])

  def memoryUsage(spark: SparkSession, path: String,
      columns: Option[Seq[String]] = None): MemoryReport = {
    // Aggregate footer stats across every part file of the dataset.
    val files = ParquetIO.dataFiles(spark, path)
    val footers = files.map(f => ParquetIO.footer(spark, f.toString))
    val perCol = footers.flatMap(_.columns.toSeq)
      .groupBy(_._1)
      .map { case (name, stats) =>
        ColumnMemory(
          column = name,
          compressedBytes = stats.map(_._2.compressedBytes).sum,
          uncompressedBytes = stats.map(_._2.uncompressedBytes).sum,
          numValues = stats.map(_._2.numValues).sum)
      }.toSeq
    val selected = columns match {
      case Some(want) =>
        val missing = want.filterNot(w => perCol.exists(_.column == w))
        if (missing.nonEmpty)
          throw new IllegalArgumentException(s"Columns not in file: ${missing.mkString(", ")}")
        perCol.filter(c => want.contains(c.column))
      case None => perCol
    }
    MemoryReport(
      path = path,
      numRows = footers.map(_.numRows).sum,
      numRowGroups = footers.map(_.numRowGroups).sum,
      totalCompressedBytes = selected.map(_.compressedBytes).sum,
      totalUncompressedBytes = selected.map(_.uncompressedBytes).sum,
      columns = selected.sortBy(_.column))
  }
}

package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Driver-side column range bounds from parquet FOOTER statistics — zero
  * Spark jobs, a few ms per footer. Used to derive deterministic
  * range-bucket split points ([[graft.ops.ScaleOps.rangeBucketExpr]])
  * without a quantile pass over the data: min/max bounds stay valid under
  * any later projection or filter (a filter can only shrink the range), so
  * equi-width splits over the footer range are a correct — if possibly
  * unbalanced — bucketing for any plan whose leaf is the scanned relation.
  * Exact per-bucket counts (which the two-phase offsets need anyway)
  * absorb any imbalance without a correctness risk. */
object FooterStats {

  /** Global [min, max] of a top-level column across `files`, from footer
    * row-group statistics only. None when any populated row group lacks
    * usable stats, when the physical/logical type isn't a plain number the
    * double cast preserves order on (int32/int64/float/double without
    * decimal/date/time annotation), or when a bound is NaN/±Inf (an
    * equi-width grid over a non-finite span is degenerate). */
  def columnRange(conf: Configuration, files: Seq[String],
      column: String): Option[(Double, Double)] = {
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var sawValue = false
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        blocks.filter(_.getRowCount > 0).foreach { block =>
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(return None)
          val pt = chunk.getPrimitiveType
          val ann = pt.getLogicalTypeAnnotation
          val plainNumber = pt.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              // UNSIGNED int annotations store raw two's-complement bits:
              // a UINT32 column straddling 2^31 would decode to negative
              // "bounds" and invert the range — reject, fall back to the
              // quantile pass
              ann == null || (ann match {
                case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
                case _ => false
              })
            case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => ann == null
            case _ => false
          }
          if (!plainNumber) return None
          val stats = chunk.getStatistics
          if (stats == null || !stats.hasNonNullValue) {
            // all-null chunk is fine; a populated chunk without stats is not
            if (stats == null || stats.getNumNulls < block.getRowCount) return None
          } else {
            val (mn, mx) = (num(stats.genericGetMin), num(stats.genericGetMax))
            if (mn.isNaN || mx.isNaN || mn.isInfinite || mx.isInfinite) return None
            lo = math.min(lo, mn); hi = math.max(hi, mx); sawValue = true
          }
        }
      } finally reader.close()
    }
    if (sawValue) Some((lo, hi)) else Some((0.0, 0.0)) // no non-null values
  }

  private def num(v: Any): Double = v match {
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long    => l.toDouble
    case f: java.lang.Float   => f.toDouble
    case d: java.lang.Double  => d
    case other => Double.NaN // unexpected stats box → caller falls back
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reader for event tables whose `ts` column is Parquet TIMESTAMP(NANOS).
  *
  * Spark 4.x rejects nanosecond Parquet timestamps outright
  * (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong=true`,
  * which surfaces them as epoch-nanos longs. This source requires that conf
  * (set it in the session builder) and normalizes `ts` to a proper
  * TimestampType (microsecond precision — Spark's native resolution).
  */
object EventsSource {

  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Read an events table, converting an epoch-nanos long `ts` to
    * TimestampType. No-op on tables whose `ts` is already a timestamp. */
  def read(spark: SparkSession, path: String, tsCol: String = "ts"): DataFrame = {
    val df = spark.read.parquet(path)
    df.schema.find(_.name == tsCol) match {
      case Some(f) if f.dataType == LongType =>
        // integer `div`, NOT `/`: double division loses 1 µs on ~1.5% of
        // post-2^53 epoch-nanos values before the cast truncates
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case _ => df
    }
  }
}

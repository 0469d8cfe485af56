package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities for 100 TB operation: skew-salted joins and bucketed
  * co-located joins. These are the manual levers for the two shuffle
  * pathologies AQE cannot always fix — extreme single-key skew on the
  * *build* side of an aggregation, and repeated joins on the same key
  * across pipelines.
  */
object ScaleOps {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a random
    * salt in [0, saltFactor); the small side is exploded `saltFactor`× so
    * every (key, salt) bucket finds its match. Correct for inner/left joins
    * on equality keys; the hot key's rows spread over `saltFactor`
    * partitions instead of one straggler task.
    *
    * Prefer AQE's skew-join splitting when it applies (sort-merge joins);
    * salting is the explicit fallback for hash aggregations and cases AQE
    * misses. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    val salted = skewed.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val exploded = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with explicit salting for a
    * single dominant group — the groupBy analogue of a salted join. Output:
    * one row per key with `count_all` and per-column sums for `sumCols`. */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("count_all"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Write a bucketed + sorted table so later equi-joins and aggregations on
    * `keys` are shuffle-free (bucket pruning + co-located join). Bucketed
    * writes go through the session catalog (`saveAsTable`) — Spark's bucket
    * metadata lives there, not in plain parquet directories. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      keys: Seq[String],
      numBuckets: Int): Unit = {
    require(keys.nonEmpty)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Read a bucketed table back (helper for symmetry/tests). */
  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

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

  // ---- bloom-prefiltered joins -----------------------------------------
  //
  // The selective-join lever for 100 TB: when a big fact side joins a
  // filtered dimension and most fact rows have NO match, a plain shuffle
  // join still shuffles every fact row. Spark's own runtime row-level
  // filtering (InjectRuntimeFilter) covers some shapes; these helpers make
  // the same bloom-prefilter an explicit, composable operator using Spark's
  // native BloomFilterAggregate / BloomFilterMightContain expressions (the
  // codegen'd machinery behind spark.sql.optimizer.runtime.bloomFilter).
  // The bloom has no false negatives, so prefilter + exact join ≡ exact
  // join — only the shuffle volume changes.

  /** Serialized bloom filter over `xxhash64(key)` of `df` (one aggregation
    * job; the binary is at most `optimalNumOfBits(expectedItems, fpp)` bits,
    * ~1.2 MB at 1 M items / 3% fpp). Returns None for an empty input.
    * `expectedItems` must stay within
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4 M) —
    * beyond that, bucket or broadcast instead. */
  def buildBloom(df: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): Option[Array[Byte]] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.select(ColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column — a codegen'd
    * predicate; the bloom bytes ride along as a literal (shipped once per
    * task with the serialized plan, like a broadcast variable). */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Equi-join with a bloom prefilter on the big side: build a bloom over
    * the small side's keys, drop big-side rows the bloom rejects BEFORE the
    * join shuffle, then run the exact join. No false negatives ⇒ result is
    * identical to the plain join; the prefilter only cuts the shuffled
    * volume (by ~the non-match fraction, at the cost of `fpp` leakage).
    * Sound for inner and semi joins only — outer joins must keep
    * non-matching rows, so prefiltering the preserved side would be wrong. */
  def bloomPrefilteredJoin(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloom prefilter is only sound for inner/semi joins, got: $joinType")
    val pref = buildBloom(small, smallKey, expectedItems, fpp) match {
      case None => big.filter(lit(false))
      case Some(bytes) => big.filter(mightContain(bytes, col(bigKey)))
    }
    pref.join(small, pref(bigKey) === small(smallKey), joinType)
  }
}

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

  /** Release the cached blocks a DataFrame's plan holds that
    * `Dataset.unpersist` / `Catalog.clearCache` CANNOT reach: blocks behind
    * `localCheckpoint` leaves (`LogicalRDD`) are registered with the RDD,
    * not the CacheManager. The `materialize = true` dedup operators return
    * such a checkpointed result (their kernel bases already released
    * inside the call) — invoke this once the result is consumed and the
    * session is block-free again. Safe on any DataFrame (no-op without
    * checkpoint leaves); the frame must not be re-executed afterwards (its
    * blocks are gone and the lineage was cut). */
  def releaseCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

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

  // ---- pre-flight shuffle diagnostics ----------------------------------
  //
  // The reports you run BEFORE choosing the levers above: whether a key is
  // skewed enough to salt, and whether a join will fan out. Both operate on
  // per-key COUNTS (one partial-aggregated shuffle over short keys), never
  // on the data itself — at 100 TB the diagnostic costs a count, not a join.

  /** One-row skew summary of `df` grouped by `keyCols`: key cardinality,
    * row count, max/mean per-key count, interpolated p50/p90/p99 of the
    * count distribution, and `skew` = max/mean (1.0 = perfectly uniform;
    * the straggler-task multiplier a shuffle on this key would suffer).
    * `exact = false` switches the percentiles to `approx_percentile` for
    * corpora where |keys| itself is huge. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
    val pct = (p: Double) =>
      if (exact) percentile(col("c"), lit(p)) else approx_percentile(col("c"), lit(p), lit(10000))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum("c").as("n_rows"),
      max("c").as("max_count"),
      round(avg("c"), 4).as("mean_count"),
      pct(0.5).as("p50_count"),
      pct(0.9).as("p90_count"),
      pct(0.99).as("p99_count"),
      round(max("c") / avg("c"), 4).as("skew"))
  }

  /** Per-key counts of the heaviest keys (the salting candidates): top-k by
    * count with each key's share of all rows. Bounded output via
    * TakeOrderedAndProject — no full sort of the key table. */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], k: Int = 20): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("key_count"))
    val total = counts.agg(sum("key_count").as("_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("key_count") / col("_total"), 6))
      .drop("_total")
      .orderBy(col("key_count").desc, struct(keyCols.map(col): _*).asc)
      .limit(k)
  }

  /** One-row join-fanout estimate for `left ⋈ right` on `keys` WITHOUT
    * running the join: per-key counts on each side (two partial-aggregated
    * shuffles), inner-joined on the key (a join of two count tables, not of
    * the data), per-key fanout = cl × cr. `est_rows` is the EXACT inner
    * equi-join output size; `max_fanout` names the single worst key's
    * contribution — the row-explosion diagnostic to check before any big
    * join (a self-join on a key with count c contributes c²). */
  def joinFanoutReport(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    val cl = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cl"))
    val cr = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cr"))
    val matched = cl.join(cr, keys).withColumn("fanout", col("cl") * col("cr"))
    val nl = cl.agg(count(lit(1)).as("n_keys_left"))
    val nr = cr.agg(count(lit(1)).as("n_keys_right"))
    matched.agg(
        count(lit(1)).as("n_keys_matched"),
        sum("fanout").as("est_rows"),
        max("fanout").as("max_fanout"),
        round(avg("fanout"), 4).as("mean_fanout"))
      .crossJoin(broadcast(nl)).crossJoin(broadcast(nr))
      .select(col("n_keys_left"), col("n_keys_right"), col("n_keys_matched"),
        col("est_rows"), col("max_fanout"), col("mean_fanout"))
  }

  /** Attach the EXCLUSIVE running sum of `cntCol` under `order` to a
    * per-distinct-value table as `outCol` — the two-phase distributed
    * cumsum: range partition on `order`, per-partition cumulative windows
    * (keyed by partition id — fully parallel), prefix-sum the
    * ≤ numPartitions per-partition totals on the driver and broadcast-join
    * the offsets back. No global single-partition window anywhere in the
    * plan; the building block behind the distributed CDF/rank paths
    * ([[graft.profile.Drift.ksStatistic]] pioneered the shape;
    * [[graft.operators.LinearModel.evalScores]] and
    * `thresholdAtKeepRate` consume this one — the quantile path uses its
    * own histogram passes, [[graft.profile.ExactQuantiles]]).
    * The localCheckpoint freezes the range partitioning so the offsets job
    * and every consumer job share it; blocks release via catalog sweeps or
    * [[releaseCheckpointBlocks]]. */
  def withExclusiveRunningSum(perV: DataFrame, order: Column,
      cntCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = perV.repartitionByRange(order)
      .withColumn("__rs_pid", spark_partition_id())
      .localCheckpoint()
    val totals = parts.groupBy("__rs_pid")
      .agg(sum(col(cntCol)).cast("long").as("__rs_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix: offset of partition i = totals of partitions < i
    val scan = totals.scanLeft((0, 0L)) { case ((_, c), (pid, t)) => (pid, c + t) }
    val offsets = scan.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = perV.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__rs_pid", "__rs_off")
    val wl = Window.partitionBy("__rs_pid").orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    parts.join(broadcast(offDf), Seq("__rs_pid"))
      .withColumn(outCol,
        coalesce(sum(col(cntCol)).over(wl), lit(0L)) + col("__rs_off"))
      .drop("__rs_pid", "__rs_off")
  }

  /** Heavy hitters via the Space-Saving sketch
    * ([[graft.functions.kernels.SpaceSavingAgg]]) — [[heavyHitters]] with
    * HARD-BOUNDED state: the exact form's shuffle carries one row per
    * distinct key per partition (unbounded for URL/id-cardinality keys);
    * the sketch ships ≤ `capacity` counters per partition and merges
    * map-side, trading exactness for a fixed memory/exchange budget.
    * Output: `(rank, key, count, err)` for the top `k` tracked keys —
    * `count` is an upper bound, `count − err` a lower bound, and when the
    * key cardinality is ≤ `capacity` the counts are exact (`err` 0). */
  def heavyHittersSketch(df: DataFrame, keyCol: String,
      k: Int = 20, capacity: Int = 1024): DataFrame = {
    require(k >= 1 && k <= capacity, s"need 1 <= k ($k) <= capacity ($capacity)")
    df.agg(graft.functions.kernels.SpaceSavingAgg.sketch(col(keyCol), capacity)
        .as("sk"))
      .select(posexplode(col("sk")).as(Seq("i", "e")))
      .filter(col("i") < k)
      .select((col("i") + 1).as("rank"), col("e.key").as("key"),
        col("e.count").as("count"), col("e.err").as("err"))
  }
}

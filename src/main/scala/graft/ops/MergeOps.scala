package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed dataset maintenance — the merge shapes that keep a 100 TB corpus
  * current between full rebuilds: plain upsert (a refreshed batch replaces
  * matching keys) and CDC application (an ordered change log of upserts and
  * deletes folded into the base).
  *
  * Scale design: both forms are ONE key-shuffle join (anti-join against the
  * touched-key set; AQE broadcasts it when the batch is small) plus a
  * shuffle-free union; nothing rewrites untouched rows in the plan. On disk
  * the same bound comes from partitioned layout +
  * `spark.sql.sources.partitionOverwriteMode=dynamic`: only partitions
  * containing touched keys rewrite.
  */
object MergeOps {

  /** `base` with `updates` folded in by `keys`: rows whose key appears in
    * `updates` are replaced, new keys append. Column sets must match
    * (enforced by `unionByName`). `updates` must be key-unique — two update
    * rows for one key would BOTH survive (the same contract as
    * [[ConcatOps]]'s duplicate-key precondition; validate with
    * `updates.groupBy(keys).count.filter("count > 1")` when the source
    * isn't trusted, one extra aggregation job). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val touched = updates.select(keys.map(col): _*)
    base.join(touched, keys, "left_anti").unionByName(updates)
  }

  /** Fold an ordered CDC change log into `base`: per key, the change with
    * the highest `seqCol` wins — an `upsert` op replaces the row, a
    * `delete` op removes the key. `changes` carries the base columns plus
    * `opCol` ∈ {'upsert','delete'} and a numeric/comparable `seqCol`.
    * Winner selection is DETERMINISTIC: highest seq first, and on a
    * (key, seq) tie 'upsert' beats 'delete' (ordering on the op column);
    * two same-key same-seq upserts with different payloads remain the
    * caller's contract violation to avoid, exactly as in a real log
    * replay. Late-arriving lower-seq changes for an already-folded key are
    * superseded as replay would.
    *
    * Plan: one window over the CHANGE LOG only (partitioned by key — never
    * a global sort), then the same anti-join + union as [[upsert]]. */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val winners = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = winners.filter(col(opCol) =!= "delete").drop(opCol, seqCol)
    val touched = winners.select(keys.map(col): _*)
    base.join(touched, keys, "left_anti").unionByName(upserts)
  }

  /** Slowly-changing-dimension (type 2) history from an ordered change
    * log: every change row becomes a validity interval `[valid_from,
    * valid_to)` per key — `valid_from` its own `seqCol` value, `valid_to`
    * the NEXT change's (SQL NULL for the current row, mirrored by
    * `is_current` = 1, an INT because exported booleans hash differently
    * across engines). The warehouse-standard "as-of any time" dimension
    * shape, built with one window over the change log partitioned by key —
    * never a global sort, cost bounded by the busiest key's change count. */
  def scd2History(changes: DataFrame, keys: Seq[String],
      seqCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).asc)
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
  }
}

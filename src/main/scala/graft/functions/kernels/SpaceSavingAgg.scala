package graft.functions.kernels

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal & El Abbadi,
  * ICDT'05) as a real aggregate function — frequency estimation with
  * HARD-BOUNDED state.
  *
  * The exact formulation of "top keys by count" is a full `groupBy`: its
  * shuffle carries one row per DISTINCT key per partition, which for
  * high-cardinality keys (URLs, user ids, shingles) at 100 TB is the
  * dominant exchange. This aggregate keeps at most `capacity` counters per
  * aggregation buffer, combines map-side, and ships ≤ `capacity` entries
  * per partition regardless of key cardinality.
  *
  * Guarantees (classic Space-Saving):
  *  - within one buffer, every tracked key's `count` OVERESTIMATES its
  *    true frequency by at most its `err`, and any key with true
  *    frequency > N/capacity is guaranteed tracked;
  *  - if NO buffer ever evicts (total distinct keys ≤ capacity), counts
  *    are EXACT (`err` = 0 everywhere) and the result is deterministic —
  *    the mode the driver oracle exercises;
  *  - after merging evicting buffers, `count − err` remains a lower bound
  *    and `count` an upper bound per tracked key; tie-breaks are by key
  *    bytes, but WHICH keys survive eviction depends on row order, as in
  *    every streaming sketch.
  *
  * Eviction scans the counter map (O(capacity)) — the right trade below
  * ~10⁵ counters; the linked-bucket O(1) structure of the paper only pays
  * off far beyond practical capacities.
  *
  * Output: `array<struct<key string, count long, err long>>` sorted by
  * (count desc, err asc, key asc). NULL keys are not counted.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Array[Long]]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Array[Long]] =
    mutable.HashMap.empty

  override def update(map: mutable.HashMap[UTF8String, Array[Long]],
      input: InternalRow): mutable.HashMap[UTF8String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      map.get(key) match {
        case Some(a) => a(0) += 1
        case None if map.size < capacity =>
          map.put(key.clone(), Array(1L, 0L))
        case None =>
          val (minKey, minCount) = evictionVictim(map)
          map.remove(minKey)
          map.put(key.clone(), Array(minCount + 1L, minCount))
      }
    }
    map
  }

  /** Smallest count, ties by key bytes — deterministic for a given map. */
  private def evictionVictim(
      map: mutable.HashMap[UTF8String, Array[Long]]): (UTF8String, Long) = {
    var mk: UTF8String = null
    var mc = Long.MaxValue
    map.foreach { case (k, a) =>
      if (a(0) < mc || (a(0) == mc && (mk == null || k.compareTo(mk) < 0))) {
        mc = a(0); mk = k
      }
    }
    (mk, mc)
  }

  override def merge(map: mutable.HashMap[UTF8String, Array[Long]],
      other: mutable.HashMap[UTF8String, Array[Long]]): mutable.HashMap[UTF8String, Array[Long]] = {
    other.foreach { case (k, a) =>
      map.get(k) match {
        case Some(m) => m(0) += a(0); m(1) += a(1)
        case None => map.put(k, a)
      }
    }
    if (map.size > capacity) {
      // keep the capacity largest (count desc, err asc, key asc) — the
      // trimmed tail's mass is NOT redistributed, preserving count as an
      // upper bound and count−err as a lower bound
      val kept = map.toArray.sortWith(orderedBefore).take(capacity)
      map.clear()
      kept.foreach { case (k, a) => map.put(k, a) }
    }
    map
  }

  /** (count desc, err asc, key asc) — the deterministic output order. */
  private def orderedBefore(
      x: (UTF8String, Array[Long]), y: (UTF8String, Array[Long])): Boolean = {
    if (x._2(0) != y._2(0)) x._2(0) > y._2(0)
    else if (x._2(1) != y._2(1)) x._2(1) < y._2(1)
    else x._1.compareTo(y._1) < 0
  }

  override def eval(map: mutable.HashMap[UTF8String, Array[Long]]): Any = {
    val sorted = map.toArray.sortWith(orderedBefore)
    new GenericArrayData(sorted.map { case (k, a) =>
      InternalRow(k, a(0), a(1))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(map: mutable.HashMap[UTF8String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(map.size)
    map.foreach { case (k, a) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(a(0))
      out.writeLong(a(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Array[Long]] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val map = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      map.put(UTF8String.fromBytes(buf), Array(in.readLong(), in.readLong()))
      i += 1
    }
    map
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("count", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "space_saving_sketch"
}

object SpaceSavingAgg {
  /** Aggregate Column: the Space-Saving summary of a (string-castable)
    * key column with at most `capacity` counters. */
  def sketch(key: Column, capacity: Int): Column =
    ColumnBridge.column(SpaceSavingAgg(
      ColumnBridge.expression(key.cast("string")), capacity).toAggregateExpression())
}

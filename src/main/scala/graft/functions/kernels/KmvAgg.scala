package graft.functions.kernels

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded set of the k smallest DISTINCT long values: the buffer behind
  * the KMV (k-minimum-values) distinct-count sketch. A java.util.TreeSet
  * capped at k — insert is a no-op once the candidate exceeds the current
  * k-th minimum, so a partition of billions of rows holds at most k longs
  * and the shuffled partial is ≤ 8k bytes regardless of input size. */
final class KMinSet(val k: Int) {
  require(k >= 2, s"k must be >= 2: $k")
  private[kernels] val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) {
      if (set.add(v)) { set.pollLast(); () }
    }
  }

  def mergeFrom(other: KMinSet): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  def toSortedArray: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** KMV distinct-count sketch aggregate: keeps the `k` smallest DISTINCT
  * values of a (hash-valued) long column and returns them as an ascending
  * `array<long>`. The caller derives the estimate `(k−1)/u_(k)` from the
  * k-th minimum (exact count when fewer than k distinct hashes exist —
  * below k the sketch IS the distinct set). Feed it a deterministic
  * uniform hash (the repo's md5-prefix idiom) so an external engine can
  * replay the identical sketch — the estimator is then bit-reproducible,
  * not just statistically equivalent (contrast HLL, whose register
  * layout is engine-private).
  *
  * Scale: map-side combining with ≤ k longs per partial; the shuffle
  * carries k·partitions longs, never the data. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinSet] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv input must be a long hash column, got ${child.dataType}")

  override def createAggregationBuffer(): KMinSet = new KMinSet(k)

  override def update(buf: KMinSet, input: InternalRow): KMinSet = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KMinSet, other: KMinSet): KMinSet = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KMinSet): Any = new GenericArrayData(buf.toSortedArray)

  override def serialize(buf: KMinSet): Array[Byte] = {
    val arr = buf.toSortedArray
    val bos = new ByteArrayOutputStream(4 + 8 * arr.length)
    val out = new DataOutputStream(bos)
    out.writeInt(arr.length)
    var i = 0
    while (i < arr.length) { out.writeLong(arr(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KMinSet = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KMinSet(k)
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_minima"
}

object KmvAgg {
  /** The k smallest distinct values of a long hash column, ascending. */
  def kMinima(hash: Column, k: Int): Column =
    ColumnBridge.column(KmvAgg(ColumnBridge.expression(hash), k)
      .toAggregateExpression())
}

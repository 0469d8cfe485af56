package graft.functions.kernels

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Expression, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a real aggregate function.
  *
  * The window formulation of per-group top-k (`row_number() OVER (PARTITION
  * BY g ORDER BY s) <= k`) must shuffle and SORT every row of every group
  * before it can discard anything. This aggregate keeps a k-bounded binary
  * heap per group instead, so it combines map-side: each input partition
  * ships at most k rows per group into the shuffle, and the reduce side
  * merges heaps. At 100 TB with a domain cap of k≈1000 that is the
  * difference between shuffling the corpus and shuffling k·partitions rows.
  *
  * Rows are carried as UnsafeRow copies of the `children` projection;
  * ordering is lexicographic over `sortIdx` fields with per-field
  * direction (nulls always rank last, i.e. a null sort key is the first
  * row evicted). Output: `array<struct<...>>` of the k best rows, best
  * first — `posexplode` restores rank (pos + 1) and the columns.
  */
case class TopKRowsAgg(
    children: Seq[Expression],
    fieldNames: Seq[String],
    sortIdx: Seq[Int],
    sortAsc: Seq[Boolean],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"k must be positive, got $k")
  require(fieldNames.length == children.length, "one name per field expression")
  require(sortIdx.nonEmpty && sortIdx.forall(i => i >= 0 && i < children.length),
    s"bad sort field indices: $sortIdx")
  require(sortIdx.length == sortAsc.length, "one direction per sort field")

  private lazy val fieldTypes: Seq[DataType] = children.map(_.dataType)
  private lazy val rowProj: UnsafeProjection = UnsafeProjection.create(children)
  private lazy val fieldOrds: Seq[Ordering[Any]] =
    sortIdx.map(i => TypeUtils.getInterpretedOrdering(fieldTypes(i)))

  /** compare < 0 ⇔ a ranks strictly before (better than) b. */
  private lazy val betterFirst: Ordering[InternalRow] = new Ordering[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      var i = 0
      while (i < sortIdx.length) {
        val f = sortIdx(i)
        val aNull = a.isNullAt(f); val bNull = b.isNullAt(f)
        val c =
          if (aNull && bNull) 0
          else if (aNull) 1 // nulls rank last regardless of direction
          else if (bNull) -1
          else {
            val raw = fieldOrds(i).compare(a.get(f, fieldTypes(f)), b.get(f, fieldTypes(f)))
            if (sortAsc(i)) raw else -raw
          }
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(betterFirst) // head = worst kept row

  override def update(heap: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    // compare the projected row BEFORE copying: once the heap is warm the
    // common case is rejection, which must not pay a per-row byte-array
    // allocation (rowProj reuses its buffer, so only kept rows copy)
    val projected = rowProj(input)
    if (heap.size < k) heap.enqueue(projected.copy())
    else if (betterFirst.compare(projected, heap.head) < 0) {
      heap.dequeue(); heap.enqueue(projected.copy())
    }
    heap
  }

  override def merge(heap: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(heap, _))
    heap
  }

  private def offer(heap: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (heap.size < k) heap.enqueue(row)
    else if (betterFirst.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row) }

  override def eval(heap: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(heap.toArray.sorted(betterFirst).asInstanceOf[Array[Any]])

  override def serialize(heap: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { r =>
      val bytes = r.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(children.length)
      row.pointTo(buf, len)
      heap.enqueue(row)
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(
    StructType(fieldNames.zip(children).map { case (n, c) =>
      StructField(n, c.dataType, c.nullable)
    }), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg = copy(children = newChildren)

  override def prettyName: String = "top_k_rows"
}

object TopKRowsAgg {

  /** Aggregate Column: the k best rows of `fields` ordered by `sortKeys`
    * (field name → ascending?), as `array<struct>` best-first. */
  def topK(k: Int, fields: Seq[(String, Column)], sortKeys: Seq[(String, Boolean)]): Column = {
    val names = fields.map(_._1)
    val idx = sortKeys.map { case (n, _) =>
      val i = names.indexOf(n)
      require(i >= 0, s"sort key $n is not among the fields: ${names.mkString(",")}")
      i
    }
    ColumnBridge.column(TopKRowsAgg(
      fields.map(f => ColumnBridge.expression(f._2)), names,
      idx, sortKeys.map(_._2), k).toAggregateExpression())
  }

  /** Decompose `Column.desc`-style sort Columns into (name, ascending).
    *
    * Null contract: the heap always ranks nulls LAST. `NullsLast` requests
    * (plain `.desc`, `asc_nulls_last`, `desc_nulls_last`) are honored
    * exactly. `desc_nulls_first` is distinguishable from the default and
    * impossible to honor, so it is REJECTED rather than silently flipped.
    * Plain `.asc` and `asc_nulls_first` produce identical SortOrder trees
    * (Ascending's default IS NullsFirst), so they cannot be told apart —
    * both are accepted with the documented nulls-last override. */
  def sortSpec(orderBy: Seq[Column]): Seq[(String, Boolean)] =
    orderBy.map(c => ColumnBridge.convertedExpression(c) match {
      case SortOrder(u: UnresolvedAttribute, dir, no, _)
          if no == NullsLast || no == dir.defaultNullOrdering =>
        (u.name, dir == Ascending)
      case SortOrder(a: AttributeReference, dir, no, _)
          if no == NullsLast || no == dir.defaultNullOrdering =>
        (a.name, dir == Ascending)
      case u: UnresolvedAttribute => (u.name, true)
      case a: AttributeReference => (a.name, true)
      case other =>
        throw new IllegalArgumentException(
          "top-k sort keys must be plain columns with optional .asc/.desc " +
            "(desc_nulls_first is not supported — the heap ranks nulls last), " +
            s"got: $other")
    })
}

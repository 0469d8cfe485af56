package graft.functions.kernels

import java.io.{ByteArrayOutputStream, DataOutputStream, DataInputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact distinct count WITHOUT the Expand: Spark plans `count(DISTINCT c)`
  * over k different columns as an Expand producing (k+1)× the input rows —
  * the dominant cost of the exact profile pass (q17-family; the numeric
  * columns escaped via [[NumericProfileAgg]], the string/date/decimal
  * columns still paid it). This typed-imperative aggregate is a REGULAR
  * aggregate to the planner (one ObjectHashAggregate, no Expand) holding a
  * per-column value set; callers feed it an injectively-stringified value
  * (`cast(v as string)` — injective for string/date/timestamp/decimal/
  * boolean), so one kernel serves every non-numeric orderable type.
  * Memory is bounded by distinct values per column per partial buffer —
  * the SAME bound the exact profile contract already documents (the
  * 100 TB mode stays `approx_count_distinct`). Nulls are ignored;
  * all-null input counts 0. */
case class DistinctCountAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[UTF8String]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"distinct_count_set input must be cast to string, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashSet[UTF8String] =
    mutable.HashSet.empty[UTF8String]

  override def update(buf: mutable.HashSet[UTF8String],
      input: InternalRow): mutable.HashSet[UTF8String] = {
    val v = child.eval(input)
    // clone: the UTF8String may point into a reused unsafe-row buffer
    if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    buf
  }

  override def merge(buf: mutable.HashSet[UTF8String],
      other: mutable.HashSet[UTF8String]): mutable.HashSet[UTF8String] = {
    buf ++= other; buf
  }

  override def eval(buf: mutable.HashSet[UTF8String]): Any = buf.size.toLong

  override def serialize(buf: mutable.HashSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s => val b = s.getBytes; out.writeInt(b.length); out.write(b) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[UTF8String] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf += UTF8String.fromBytes(b)
      i += 1
    }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): DistinctCountAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DistinctCountAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DistinctCountAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "distinct_count_set"
}

object DistinctCountAgg {
  /** Exact distinct count of `v` (cast to string by the caller when not
    * already a string) as a regular — never Expand-planned — aggregate. */
  def distinctCount(v: Column): Column =
    ColumnBridge.column(DistinctCountAgg(ColumnBridge.expression(v))
      .toAggregateExpression())
}

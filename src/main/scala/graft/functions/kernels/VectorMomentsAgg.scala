package graft.functions.kernels

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** First and second vector moments in ONE aggregation buffer: n, Σx (d
  * doubles) and the upper triangle of Σ x·xᵀ (d(d+1)/2 doubles) — the one
  * pass every covariance / PCA / whitening computation over an embedding
  * column needs.
  *
  * Why a typed aggregate and not posexplode²: the explode formulation
  * multiplies every row by d² before the partial aggregation (d = 64 →
  * 4096 shuffled-then-combined rows per vector, dominated by row
  * materialization CPU); this buffer costs one fused multiply-add sweep
  * per row and shuffles exactly ONE d(d+3)/2-double buffer per partition.
  * At 100 TB the shuffle volume is partitions × ~17 KB (d = 64),
  * independent of row count.
  *
  * Inputs must all share one dimension — a mismatched vector raises with
  * the offending sizes (the SignBitsExpr convention). NULL vectors are
  * ignored; all-null input evaluates to NULL.
  *
  * Output: struct(n, sums array<double> [d], xtx array<double>
  * [d(d+1)/2, row-major upper triangle: k = i·d − i(i−1)/2 + (j−i)]).
  */
case class VectorMomentsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMomentsAgg.Buffer] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_moments input must be array<float|double>, got $other")
    }

  // lazy: dataType is only meaningful post-analysis (the NumericProfileAgg
  // convention — an unresolved child would throw in the constructor)
  private lazy val isFloat: Boolean =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def createAggregationBuffer(): VectorMomentsAgg.Buffer =
    new VectorMomentsAgg.Buffer()

  override def update(buf: VectorMomentsAgg.Buffer,
      input: InternalRow): VectorMomentsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.n == 0L && buf.dim == 0) buf.init(d)
      require(d == buf.dim,
        s"vector_moments: dimension mismatch ($d vs ${buf.dim})")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf.n += 1L
      var k = 0
      i = 0
      while (i < d) {
        buf.s(i) += x(i)
        var j = i
        while (j < d) {
          buf.ss(k) += x(i) * x(j)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VectorMomentsAgg.Buffer,
      other: VectorMomentsAgg.Buffer): VectorMomentsAgg.Buffer = {
    if (other.n == 0L) return buf
    if (buf.n == 0L && buf.dim == 0) buf.init(other.dim)
    require(other.dim == buf.dim,
      s"vector_moments: dimension mismatch (${other.dim} vs ${buf.dim})")
    buf.n += other.n
    var i = 0
    while (i < buf.s.length) { buf.s(i) += other.s(i); i += 1 }
    i = 0
    while (i < buf.ss.length) { buf.ss(i) += other.ss(i); i += 1 }
    buf
  }

  override def eval(buf: VectorMomentsAgg.Buffer): Any = {
    if (buf.n == 0L) return null
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(buf.s.clone()),
      new GenericArrayData(buf.ss.clone())))
  }

  override def serialize(buf: VectorMomentsAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.dim)
    var i = 0
    while (i < buf.s.length) { out.writeDouble(buf.s(i)); i += 1 }
    i = 0
    while (i < buf.ss.length) { out.writeDouble(buf.ss(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMomentsAgg.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.n = in.readLong()
    val d = in.readInt()
    if (d > 0) {
      buf.init(d)
      var i = 0
      while (i < buf.s.length) { buf.s(i) = in.readDouble(); i += 1 }
      i = 0
      while (i < buf.ss.length) { buf.ss(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("xtx", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(offset: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMomentsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "vector_moments"
}

object VectorMomentsAgg {
  /** Mutable (n, Σx, upper-tri Σxxᵀ) accumulator; dim fixes on first use. */
  final class Buffer {
    var n: Long = 0L
    var dim: Int = 0
    var s: Array[Double] = Array.emptyDoubleArray
    var ss: Array[Double] = Array.emptyDoubleArray
    def init(d: Int): Unit = {
      dim = d
      s = new Array[Double](d)
      ss = new Array[Double](d * (d + 1) / 2)
    }
  }

  /** Aggregate Column over an array<float|double> vector column. */
  def vectorMoments(v: Column): Column =
    ColumnBridge.column(VectorMomentsAgg(
      ColumnBridge.expression(v)).toAggregateExpression())
}

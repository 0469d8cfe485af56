package graft.functions.kernels

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Compiled kernels for data-layout operators (Z-order clustering). */
object LayoutKernels {

  /** Morton (Z-order) interleave: bit `b` of dimension `c` lands at output
    * bit `b * numDims + c`, so sorting by the result groups rows that are
    * close in EVERY dimension (the space-filling-curve locality property;
    * Morton 1966, public domain — the same layout trick Delta Lake's
    * OPTIMIZE ZORDER applies). Inputs are `bits`-wide non-negative ints;
    * `bits * numDims` must fit in 63 bits. Both contracts are ENFORCED
    * here (shift amounts are mod-64 on the JVM, so violations would
    * silently wrap into corrupted clustering keys; the array length is
    * only known at runtime, so the expression cannot check at bind time). */
  def interleaveBits(dims: ArrayData, bits: Int): Long = {
    val n = dims.numElements()
    if (n * bits > 63)
      throw new IllegalArgumentException(
        s"$n dims x $bits bits exceeds a long (63 bits) — z-values would wrap")
    var c = 0
    while (c < n) {
      val d = dims.getInt(c)
      // >>> catches negatives (sign bit survives any <=31-bit shift) and
      // values wider than `bits` in one test
      if ((d >>> bits) != 0)
        throw new IllegalArgumentException(
          s"dimension $c value $d is negative or exceeds $bits bits")
      c += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      c = 0
      while (c < n) {
        out |= ((dims.getInt(c).toLong >> b) & 1L) << (b * n + c)
        c += 1
      }
      b += 1
    }
    out
  }
}

/** Z-value of an array<int> of bucketized dimensions. Generates code (a
  * call into the compiled kernel) so it stays inside whole-stage codegen. */
case class InterleaveBitsExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 31, s"bits per dimension must be in [1,31]: $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    LayoutKernels.interleaveBits(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.kernels.LayoutKernels.interleaveBits($c, $bits)")
  override protected def withNewChildInternal(c: Expression): InterleaveBitsExpr =
    copy(child = c)
  override def prettyName: String = "interleave_bits"
}

object LayoutKernelFunctions {
  /** Morton z-value Column over an array<int> of bucketized dimensions. */
  def interleaveBits(dims: Column, bits: Int): Column =
    ColumnBridge.column(InterleaveBitsExpr(ColumnBridge.expression(dims), bits))
}

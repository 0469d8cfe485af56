package graft.functions.kernels

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Static-kernel half of [[RangeBucketExpr]]: count of split points ≤ v by
  * binary search. `Arrays.binarySearch` orders NaN greatest (Double.compare
  * semantics), matching Spark's NaN-greatest sort order, so NaN lands in
  * the last ascending bucket exactly like the rows sort. */
object RangeBucketKernel {
  def countLe(splits: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(splits, v)
    if (i >= 0) i + 1 else -i - 1 // splits are deduped: single match
  }
}

/** Deterministic range-bucket id of a double under driver-collected split
  * points ([[graft.ops.ScaleOps.rangeBucketExpr]] semantics): ascending —
  * number of splits ≤ v; descending — number of splits > v; null → bucket
  * 0 (nulls-first) or `splits.length` (nulls-last). O(log n) binary search
  * in compact generated code — the chained-CASE-WHEN formulation at n=128
  * splits produced kilobytes of branchy codegen per use site and O(n)
  * per-row work; this stays inside whole-stage codegen with one kernel
  * call. Never null: the bucket of a null value is still a bucket. */
case class RangeBucketExpr(child: Expression, splits: Array[Double],
    descending: Boolean, nullsFirst: Boolean) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def checkInputDataTypes() = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"range_bucket expects double, got ${child.dataType}")
  }

  private def nullBucket: Int = if (nullsFirst) 0 else splits.length

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullBucket
    else {
      val cLe = RangeBucketKernel.countLe(splits, v.asInstanceOf[Double])
      if (descending) splits.length - cLe else cLe
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("splits", splits, "double[]")
    val c = child.genCode(ctx)
    val cLe = ctx.freshName("cLe")
    val value = if (descending) s"($arr.length - $cLe)" else cLe
    ev.copy(
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${c.code}
        int ${ev.value} = $nullBucket;
        if (!${c.isNull}) {
          int $cLe = graft.functions.kernels.RangeBucketKernel.countLe($arr, ${c.value});
          ${ev.value} = $value;
        }
      """)
  }

  override protected def withNewChildInternal(nc: Expression): RangeBucketExpr =
    copy(child = nc)
  override def prettyName: String = "range_bucket"
}

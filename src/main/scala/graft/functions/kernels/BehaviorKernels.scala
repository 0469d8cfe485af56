package graft.functions.kernels

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Compiled behavioral-analytics kernels.
  *
  * [[FunnelDepthExpr]] consumes a user's event history as a SORTED
  * `array<long>` where each element packs `(epoch_micros << 3) | stage`
  * (stage ∈ 1..7). Packing into a primitive long (instead of
  * `array<struct<ts,stage>>`) keeps the per-user state off-heap-friendly
  * (8 bytes/event in Tungsten's UnsafeArrayData, no struct headers), makes
  * `sort_array` a primitive sort, and lets the depth scan run as one
  * compiled loop over a flat long array — the same reasoning as the packed
  * band keys in the LSH operators. Epoch micros for any plausible event
  * time (< year 294247) fit in 61 bits, so `<< 3` cannot overflow.
  */
object BehaviorKernels { // public: generated code references it by name

  /** Greedy ordered-funnel depth over events sorted by (ts, stage):
    * advance to stage d+1 on the first stage-(d+1) event whose timestamp is
    * STRICTLY after the event that advanced to stage d. Greedy-earliest is
    * optimal (taking the earliest qualifying event maximizes the remaining
    * suffix), so this equals the sequential `min(ts) where ts > prev` CTE
    * construction an external oracle uses. */
  def funnelDepth(evs: ArrayData, numStages: Int): Int = {
    var depth = 0
    var lastTs = Long.MinValue
    val n = evs.numElements()
    var i = 0
    while (i < n && depth < numStages) {
      val v = evs.getLong(i)
      val stage = (v & 7L).toInt
      val ts = v >>> 3
      if (stage == depth + 1 && ts > lastTs) { depth += 1; lastTs = ts }
      i += 1
    }
    depth
  }

  /** Depth with a CONVERSION WINDOW, anchored at the user's FIRST stage-1
    * event: later stages only count within `windowMicros` of that anchor —
    * "purchased within 24h of first view". The anchor is DELIBERATELY the
    * first entry (the product-analytics convention, and what a
    * sequential-min SQL oracle computes), NOT the depth-maximizing one: a
    * user whose first window misses but whose later re-entry would convert
    * still reports the first window's depth. `windowMicros =
    * Long.MaxValue` degenerates to [[funnelDepth]]. */
  def funnelDepthWithin(evs: ArrayData, numStages: Int, windowMicros: Long): Int = {
    var depth = 0
    var lastTs = Long.MinValue
    var firstTs = Long.MaxValue
    val n = evs.numElements()
    var i = 0
    while (i < n && depth < numStages) {
      val v = evs.getLong(i)
      val stage = (v & 7L).toInt
      val ts = v >>> 3
      if (stage == depth + 1 && ts > lastTs
          && (depth == 0 || ts - firstTs <= windowMicros)) {
        if (depth == 0) firstTs = ts
        depth += 1
        lastTs = ts
      }
      i += 1
    }
    depth
  }

  /** Same greedy scan, returning the advance TIMESTAMPS (epoch micros, one
    * per reached stage, length = depth) instead of just the depth — the
    * input to time-to-convert metrics (duration = last − first). */
  def funnelAdvanceTs(evs: ArrayData, numStages: Int): GenericArrayData = {
    var depth = 0
    var lastTs = Long.MinValue
    val out = new Array[Long](numStages)
    val n = evs.numElements()
    var i = 0
    while (i < n && depth < numStages) {
      val v = evs.getLong(i)
      val stage = (v & 7L).toInt
      val ts = v >>> 3
      if (stage == depth + 1 && ts > lastTs) { out(depth) = ts; depth += 1; lastTs = ts }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, depth))
  }
}

/** Funnel depth (0..numStages) reached by one user's packed event array —
  * see [[BehaviorKernels.funnelDepth]]. Generates code (a kernel call) so
  * the post-aggregation projection stays inside whole-stage codegen. */
case class FunnelDepthExpr(child: Expression, numStages: Int)
    extends UnaryExpression {
  require(numStages >= 1 && numStages <= 7,
    s"funnel supports 1..7 stages (3-bit packing), got $numStages")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    BehaviorKernels.funnelDepth(v.asInstanceOf[ArrayData], numStages)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.kernels.BehaviorKernels.funnelDepth($c, $numStages)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "funnel_depth"
}

object FunnelDepth {
  /** Column wrapper: depth over a sorted packed-long event array. */
  def apply(evs: Column, numStages: Int): Column =
    ColumnBridge.column(FunnelDepthExpr(ColumnBridge.expression(evs), numStages))
}

/** Window-anchored funnel depth — see [[BehaviorKernels.funnelDepthWithin]]. */
case class FunnelDepthWithinExpr(child: Expression, numStages: Int,
    windowMicros: Long) extends UnaryExpression {
  require(numStages >= 1 && numStages <= 7,
    s"funnel supports 1..7 stages (3-bit packing), got $numStages")
  require(windowMicros > 0, s"window must be positive: $windowMicros")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    BehaviorKernels.funnelDepthWithin(v.asInstanceOf[ArrayData], numStages,
      windowMicros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.kernels.BehaviorKernels.funnelDepthWithin($c, $numStages, ${windowMicros}L)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "funnel_depth_within"
}

object FunnelDepthWithin {
  def apply(evs: Column, numStages: Int, windowMicros: Long): Column =
    ColumnBridge.column(
      FunnelDepthWithinExpr(ColumnBridge.expression(evs), numStages, windowMicros))
}

/** Advance timestamps (epoch-micros array, length = reached depth) of the
  * greedy funnel scan — see [[BehaviorKernels.funnelAdvanceTs]]. */
case class FunnelAdvanceTsExpr(child: Expression, numStages: Int)
    extends UnaryExpression {
  require(numStages >= 1 && numStages <= 7,
    s"funnel supports 1..7 stages (3-bit packing), got $numStages")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    BehaviorKernels.funnelAdvanceTs(v.asInstanceOf[ArrayData], numStages)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.kernels.BehaviorKernels.funnelAdvanceTs($c, $numStages)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "funnel_advance_ts"
}

object FunnelAdvanceTs {
  def apply(evs: Column, numStages: Int): Column =
    ColumnBridge.column(FunnelAdvanceTsExpr(ColumnBridge.expression(evs), numStages))
}

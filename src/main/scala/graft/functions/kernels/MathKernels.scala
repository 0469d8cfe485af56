package graft.functions.kernels

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** ln Γ(x) as a codegen'd scalar — the combinatorial primitive behind
  * exact small-sample inference (hypergeometric tail sums, beta/binomial
  * likelihoods): log-space binomial coefficients `ln C(n,k) =
  * lnΓ(n+1) − lnΓ(k+1) − lnΓ(n−k+1)` stay finite where factorials
  * overflow at n ≈ 170. Spark ships no lgamma; the Lanczos evaluation
  * lives in [[graft.profile.Stat.lnGamma]] (g = 7, 9-term public
  * constants — textbook numerical method, ~1e-14 relative error, which
  * exp() turns into the same relative error on probabilities). Generates
  * code (a static call into the compiled method) so it stays inside
  * whole-stage codegen spans. */
case class LnGammaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    graft.profile.Stat.lnGamma(v.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.profile.Stat.lnGamma($c)")
  override protected def withNewChildInternal(c: Expression): LnGammaExpr =
    copy(child = c)
  override def prettyName: String = "ln_gamma"
}

/** Column-facing constructors. */
object MathKernelFunctions {
  def lnGamma(x: Column): Column =
    ColumnBridge.column(LnGammaExpr(ColumnBridge.expression(x)))

  /** Log binomial coefficient ln C(n, k); both arguments as Columns. */
  def lnChoose(n: Column, k: Column): Column =
    lnGamma(n + 1) - lnGamma(k + 1) - lnGamma(n - k + 1)
}

package graft.functions.kernels

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Compiled dense-vector kernels. The `zip_with`/`aggregate` formulations in
  * [[graft.functions.VectorFunctions]] are correct but interpreted; these run
  * the inner loop compiled — the difference between ~10 µs and ~100 ns per
  * 64-dim cosine, which dominates candidate verification in ANN/near-dup
  * pipelines at scale. */
object VectorKernels { // public: generated code references it by name

  def toDoubles(a: ArrayData, elem: DataType): Array[Double] = elem match {
    case DoubleType => a.toDoubleArray()
    case FloatType =>
      val n = a.numElements()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = a.getFloat(i); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"unsupported vector element type: $other")
  }

  def dot(x: Array[Double], y: Array[Double]): Double = {
    require(x.length == y.length, s"vector length mismatch: ${x.length} vs ${y.length}")
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  /** One-pass cosine over raw ArrayData — called from both interpreted eval
    * and generated code (hence public, JVM-simple signature). */
  def cosine(a: ArrayData, aIsFloat: Boolean, b: ArrayData, bIsFloat: Boolean): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }
}

private[kernels] trait VectorBinary extends BinaryExpression with CodegenFallback {
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  protected def vec(e: Expression, v: Any): Array[Double] =
    VectorKernels.toDoubles(v.asInstanceOf[ArrayData], elemType(e))
}

/** Σ aᵢ·bᵢ as double over array<float>/array<double>. */
case class DotProductExpr(left: Expression, right: Expression) extends VectorBinary {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(vec(left, a), vec(right, b))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "dot_product"
}

/** Cosine similarity (0.0 when either norm is zero) — one pass computing
  * dot, ‖a‖², ‖b‖². Generates code (a kernel call) so it doesn't split
  * whole-stage-codegen spans in candidate-verification projections. */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinary {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = elemType(e) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.kernels.VectorKernels.cosine($a, ${isFloat(left)}, $b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "cosine_similarity"
}

/** Sign-random-projection bits (array<int> of 0/1): bit p = sign(v · rₚ)
  * with rₚ ∈ {−1,+1}^dim from a seeded deterministic RNG — same planes as
  * [[graft.functions.VectorFunctions.signProjectionBits]]. */
case class SignBitsExpr(child: Expression, dim: Int, numBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // planes materialized once per expression instance (numBits × dim doubles)
  @transient private lazy val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numBits)(Array.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  override def nullSafeEval(v: Any): Any = {
    val x = VectorKernels.toDoubles(v.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType)
    require(x.length == dim,
      s"sign_projection_bits: vector has ${x.length} elements but dim=$dim was declared")
    val bits = new Array[Int](numBits)
    var p = 0
    while (p < numBits) {
      val plane = planes(p)
      var s = 0.0
      var i = 0
      while (i < x.length) { s += x(i) * plane(i); i += 1 }
      bits(p) = if (s >= 0.0) 1 else 0
      p += 1
    }
    new GenericArrayData(bits)
  }
  override protected def withNewChildInternal(c: Expression): SignBitsExpr = copy(child = c)
  override def prettyName: String = "sign_projection_bits"
}

/** Unit-normalized copy (`v / ‖v‖₂`, double array; unchanged values when
  * the norm is zero) — compiled replacement for the interpreted
  * `transform(v, x => x / norm)` formulation: pre-normalizing a corpus
  * once turns every downstream cosine into a plain dot product, so this
  * runs once per row over the WHOLE corpus — exactly the hot-loop shape
  * the kernel family exists for. */
case class L2NormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = VectorKernels.toDoubles(v.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType)
    var ss = 0.0
    var i = 0
    while (i < x.length) { ss += x(i) * x(i); i += 1 }
    val n = math.sqrt(ss)
    if (n > 0.0) {
      i = 0
      while (i < x.length) { x(i) = x(i) / n; i += 1 }
    }
    new GenericArrayData(x)
  }
  override protected def withNewChildInternal(c: Expression): L2NormalizeExpr =
    copy(child = c)
  override def prettyName: String = "l2_normalize"
}

/** Symmetric int8 quantization summary — the storage-compression step for
  * embedding columns at corpus scale (fp32 → 1 byte/dim + one scale).
  * `scale = max|vᵢ|/127`; `codeᵢ = ⌊vᵢ/scale + 0.5⌋` (explicit floor-plus-
  * half so an external SQL oracle reproduces every code bit-for-bit —
  * `Math.round` semantics without relying on them). Emits the scale plus
  * exact integer invariants of the code vector rather than the codes
  * themselves: struct(scale, n_dims, sum_q, sum_abs_q, min_q, max_q).
  * Zero vectors quantize to all-zero codes with scale 0. One compiled
  * two-pass loop per row; no array materialization. */
case class I8QuantStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("n_dims", IntegerType, nullable = false),
    StructField("sum_q", LongType, nullable = false),
    StructField("sum_abs_q", LongType, nullable = false),
    StructField("min_q", IntegerType, nullable = false),
    StructField("max_q", IntegerType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val x = VectorKernels.toDoubles(v.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType)
    var maxAbs = 0.0
    var i = 0
    while (i < x.length) {
      val a = math.abs(x(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    var sum = 0L; var sumAbs = 0L
    var minQ = 0L; var maxQ = 0L
    if (scale > 0.0) {
      minQ = Long.MaxValue; maxQ = Long.MinValue
      i = 0
      while (i < x.length) {
        val q = math.floor(x(i) / scale + 0.5).toLong
        sum += q; sumAbs += math.abs(q)
        if (q < minQ) minQ = q
        if (q > maxQ) maxQ = q
        i += 1
      }
      if (x.length == 0) { minQ = 0L; maxQ = 0L }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, x.length, sum, sumAbs, minQ.toInt, maxQ.toInt))
  }
  override protected def withNewChildInternal(c: Expression): I8QuantStatsExpr =
    copy(child = c)
  override def prettyName: String = "i8_quant_stats"
}

/** `argmin_j Σ_d (v[d] − c_j[d])²` with the kmeansLloyd determinism
  * contract compiled in: distances accumulate LEFT-TO-RIGHT over
  * dimensions (term order identical to the unrolled
  * `((t₀²+t₁²)+t₂²)…` left fold it replaces, so every assignment is
  * bit-for-bit reproducible by an external oracle) and ties break to the
  * lowest centroid index (strict `<` keeps the first minimum). Centroids
  * ride inside the expression (k × dims doubles serialized with the plan,
  * like a broadcast variable). Replaces the k unrolled per-centroid
  * squared-L2 column expressions whose generated code grows O(k·dims) and
  * falls over janino method-size limits past dims ≈ 64: the kernel is one
  * call whatever k and dims are. */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "at least one centroid required")
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val x = VectorKernels.toDoubles(v.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType)
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      require(x.length == c.length,
        s"nearest_centroid: vector has ${x.length} dims, centroid $j has ${c.length}")
      var d = 0.0
      var i = 0
      while (i < c.length) { val t = x(i) - c(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroidExpr =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** The PQ/ADC query-side lookup table as ONE expression node: cell
  * `[j][c] = Σ_i (v[j·sub+i] − codebooks[j][c][i])²`, accumulated
  * LEFT-TO-RIGHT over i — value-identical to the unrolled
  * `array(array((q[i]−lit)², …))` column tree it replaces. The unrolled
  * form built an m·k·sub-term expression tree (~3 000 nodes at 8×16×8)
  * whose per-action Catalyst analysis/optimization cost ~3 s of DRIVER
  * time per run (measured; execution itself was trivial — the LUT
  * evaluates once per query row). Interpreted eval (CodegenFallback) is
  * deliberate: |queries| rows per batch, never the corpus. */
case class PqLutExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "non-empty codebooks required")
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val x = VectorKernels.toDoubles(v.asInstanceOf[ArrayData],
      child.dataType.asInstanceOf[ArrayType].elementType)
    val sub = codebooks.head.head.length
    require(x.length >= codebooks.length * sub,
      s"pq_lut: vector has ${x.length} dims, need ${codebooks.length * sub}")
    val rows = new Array[Any](codebooks.length)
    var j = 0
    while (j < codebooks.length) {
      val cb = codebooks(j)
      val cells = new Array[Any](cb.length)
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < sub) { val t = x(j * sub + i) - cent(i); d += t * t; i += 1 }
        cells(c) = d
        c += 1
      }
      rows(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(cells)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
  override def prettyName: String = "pq_lut"
}

/** `v − centroids[listId]` element-wise — the residual a vector carries
  * into per-list PQ encoding (IVF+PQ composition, Jégou et al. 2011 §IV).
  * Each element is ONE double subtraction on the exact double promotions
  * of the inputs, so an external oracle recomputing `v[i] − c[i]` lands on
  * the identical residual bit-for-bit. Centroids ride inside the
  * expression like [[NearestCentroidExpr]]'s. */
case class CentroidResidualExpr(left: Expression, right: Expression,
    centroids: Array[Array[Double]])
    extends BinaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "at least one centroid required")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, lid: Any): Any = {
    val x = VectorKernels.toDoubles(v.asInstanceOf[ArrayData],
      left.dataType.asInstanceOf[ArrayType].elementType)
    val j = lid.asInstanceOf[Int]
    require(j >= 0 && j < centroids.length,
      s"centroid_residual: list id $j out of range [0, ${centroids.length})")
    val c = centroids(j)
    require(x.length == c.length,
      s"centroid_residual: vector has ${x.length} dims, centroid $j has ${c.length}")
    val out = new Array[Any](x.length)
    var i = 0
    while (i < x.length) { out(i) = x(i) - c(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "centroid_residual"
}

object VectorKernelFunctions {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def signBits(v: Column, dim: Int, numBits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(SignBitsExpr(ColumnBridge.expression(v), dim, numBits, seed))
  def i8QuantStats(v: Column): Column =
    ColumnBridge.column(I8QuantStatsExpr(ColumnBridge.expression(v)))
  def l2Normalize(v: Column): Column =
    ColumnBridge.column(L2NormalizeExpr(ColumnBridge.expression(v)))
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidExpr(ColumnBridge.expression(v), centroids))
  def pqLut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(v), codebooks))
  def centroidResidual(v: Column, listId: Column,
      centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidResidualExpr(
      ColumnBridge.expression(v), ColumnBridge.expression(listId), centroids))
}

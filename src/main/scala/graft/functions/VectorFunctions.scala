package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` embedding columns,
  * built from Spark's higher-order functions (`zip_with` / `aggregate` /
  * `transform`) — codegen'd, no UDFs, no serialization boundary (north-star
  * extensions, SURVEY §7.2 step 10).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b); 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** ‖a − b‖₂ */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** a / ‖a‖₂ (unchanged if zero norm). Pre-normalizing a corpus once turns
    * every cosine into a plain dot product — do this before ANN search.
    * Runs the compiled kernel ([[kernels.L2NormalizeExpr]]): this executes
    * once per row over the whole corpus, precisely where an interpreted
    * `transform` lambda would cost ~10×. */
  def l2Normalize(a: Column): Column = kernels.VectorKernelFunctions.l2Normalize(a)

  /** Symmetric int8 quantization summary (compiled kernel): struct(scale,
    * n_dims, sum_q, sum_abs_q, min_q, max_q) where `scale = max|vᵢ|/127`
    * and `codeᵢ = ⌊vᵢ/scale + 0.5⌋` — the fp32→int8 storage-compression
    * audit for embedding columns. See
    * [[graft.functions.kernels.I8QuantStatsExpr]]. */
  def i8QuantStats(v: Column): Column = kernels.VectorKernelFunctions.i8QuantStats(v)

  /** Sign-random-projection bits: bit p = sign(Σⱼ vⱼ·rₚⱼ) where rₚⱼ ∈ {−1,+1}
    * comes from a deterministic seeded RNG — the classic cosine-LSH family
    * (Charikar, STOC'02). Returns an array<int> of 0/1 of length `numBits`.
    *
    * The projection matrix is materialized driver-side (numBits × dim
    * doubles) and shipped as a literal — tiny, broadcast once with the plan,
    * no shuffle. */
  def signProjectionBits(v: Column, dim: Int, numBits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(numBits)(Seq.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
    val vd = asDouble(v)
    val bits = planes.map { plane =>
      val planeLit = array(plane.map(lit): _*)
      when(aggregate(zip_with(vd, planeLit, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) >= 0.0, 1).otherwise(0)
    }
    array(bits: _*)
  }

  /** Pack sign bits into band bucket-ids: `numBands` integers, each encoding
    * `bitsPerBand` consecutive bits. Vectors sharing any band bucket are ANN
    * candidates (multi-probe banding = recall knob). */
  def bandBuckets(bits: Column, numBands: Int, bitsPerBand: Int): Column = {
    val bands = (0 until numBands).map { b =>
      aggregate(slice(bits, b * bitsPerBand + 1, bitsPerBand),
        lit(0), (acc, x) => acc * 2 + x)
    }
    array(bands: _*)
  }
}

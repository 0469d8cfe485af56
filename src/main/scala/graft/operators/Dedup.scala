package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for training-data pipelines (north-star
  * extensions, SURVEY §7.2 step 10): exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is candidate-generation-by-bucketing (a
  * shuffle on a short key) followed by pair verification (join back on id) —
  * never an all-pairs comparison. At 100 TB the bucket shuffle is the only
  * wide stage and AQE's skew-join handling splits hot buckets.
  */
object Dedup {

  /** Exact dedup on a hash of `cols`: keeps the row with the smallest
    * `idCol` per duplicate group (deterministic winner). */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(cols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups: (keeper id, group size) per distinct value
    * combination, keeping only groups with > 1 member when `dupsOnly`. */
  def exactGroups(df: DataFrame, cols: Seq[String], idCol: String,
      dupsOnly: Boolean = false): DataFrame = {
    val g = df.groupBy(cols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))
    if (dupsOnly) g.filter(col("group_size") > 1) else g
  }

  /** MinHash signature: `numHashes` minima of per-shingle 64-bit hashes.
    * Family member i is `xxhash64(shingle, i)` — one codegen'd expression
    * per hash, evaluated in a single pass over the shingle array. */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column = {
    val sh = TextFunctions.shingleSet(text, shingleSize)
    array((0 until numHashes).map { i =>
      when(size(sh) === 0, lit(Long.MaxValue))
        .otherwise(array_min(transform(sh, s => xxhash64(s, lit(i)))))
    }: _*)
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → minhash signature → split into `numBands` bands →
    * band-bucket join (candidates = docs sharing any band) → exact Jaccard
    * verification on the shingle sets → pairs with jaccard ≥ threshold.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, distinct.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      numBands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into numBands evenly")
    val rowsPerBand = numHashes / numBands

    val base = df.select(
      col(idCol).as("id"),
      TextFunctions.shingleSet(col(textCol), shingleSize).as("shingles"))
      .withColumn("sig", array((0 until numHashes).map { i =>
        when(size(col("shingles")) === 0, lit(Long.MaxValue))
          .otherwise(array_min(transform(col("shingles"), s => xxhash64(s, lit(i)))))
      }: _*))

    // band hash per (doc, band); posexplode keeps band index in the key so
    // bucket collisions across different bands don't create candidates
    val banded = base.select(col("id"),
      posexplode(array((0 until numBands).map { b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
      }: _*)).as(Seq("band", "bucket")))

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    verifyJaccard(candidates, base.select(col("id"), col("shingles")), threshold)
  }

  /** n-gram Jaccard dedup without MinHash: candidates = pairs sharing any
    * single shingle (exact-recall, heavier than LSH — right when shingles
    * are rare, e.g. long n-grams), then exact Jaccard verification. */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextFunctions.shingleSet(col(textCol), shingleSize).as("shingles"))
    val exploded = base.select(col("id"), explode(col("shingles")).as("shingle"))
      // hash the shingle so the shuffle key is 8 bytes, not the n-gram text
      .select(col("id"), xxhash64(col("shingle")).as("sh"))
    val a = exploded.select(col("sh"), col("id").as("id_a"))
    val b = exploded.select(col("sh"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(candidates, base, threshold)
  }

  private def verifyJaccard(candidates: DataFrame, shingled: DataFrame,
      threshold: Double): DataFrame = {
    val sa = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        when(size(array_union(col("sh_a"), col("sh_b"))) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: bit k of the result is the sign
    * of Σ_tokens count(t) · (bit k of xxhash64(t) ? +1 : −1).
    *
    * Computed per-row from column expressions: 64 aggregate-over-array
    * expressions, all inside whole-stage codegen. */
  def simhash(text: Column): Column = {
    val tokenCounts = {
      val ts = TextFunctions.tokens(text)
      // (token, count) pairs via distinct + per-token count
      transform(array_distinct(ts), t =>
        struct(xxhash64(t).as("h"),
          size(filter(ts, x => x === t)).cast("long").as("c")))
    }
    val bitCols = (0 until 64).map { k =>
      val contrib = aggregate(tokenCounts, lit(0L), (acc, tc) =>
        acc + when(shiftright(tc.getField("h"), k).bitwiseAND(1L) === 1L,
          tc.getField("c")).otherwise(-tc.getField("c")))
      when(contrib >= 0L, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share at least one of `numChunks`
    * 16-bit chunks (pigeonhole: any pair within hamming distance
    * `numChunks − 1` shares a chunk), verified by exact hamming distance. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      numChunks: Int = 4): DataFrame = {
    val bitsPerChunk = 64 / numChunks
    val base = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = base.select(col("id"), col("sh"),
      posexplode(array((0 until numChunks).map { c =>
        shiftright(col("sh"), c * bitsPerChunk)
          .bitwiseAND((1L << bitsPerChunk) - 1L)
      }: _*)).as(Seq("chunk", "value")))
    val a = chunked.select(col("chunk"), col("value"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("value"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "value"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs via sign-projection LSH banding,
    * verified with exact cosine. `dim` is the embedding dimensionality. */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      numBits: Int = 32,
      numBands: Int = 8,
      seed: Long = 42L): DataFrame = {
    val bitsPerBand = numBits / numBands
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bits", VectorFunctions.signProjectionBits(col("vec"), dim, numBits, seed))
      .withColumn("bands", VectorFunctions.bandBuckets(col("bits"), numBands, bitsPerBand))
    val banded = base.select(col("id"), col("vec"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }
}

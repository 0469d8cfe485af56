package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.functions.kernels.{TextKernelFunctions, VectorKernelFunctions}

/** Compiled kernels must agree with their declarative reference
  * implementations. */
class KernelSpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine kernel matches the zip_with/aggregate reference") {
    val df = spark.read.parquet(sf("embeddings")).limit(20)
      .select($"vec_id", $"embedding")
    val pairs = df.crossJoin(df.select($"vec_id".as("id2"), $"embedding".as("e2")))
    val both = pairs.select(
      VectorKernelFunctions.cosineSimilarity($"embedding", $"e2").as("kernel"),
      VectorFunctions.cosine($"embedding", $"e2").as("reference"))
    val rows = both.collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("dot kernel matches reference dot") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(VectorKernelFunctions.dotProduct($"a", $"b"),
      VectorFunctions.dot($"a", $"b")).head()
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 32.0)
  }

  test("sign bits kernel matches the literal-plane reference") {
    val df = spark.read.parquet(sf("embeddings")).limit(10)
    val both = df.select(
      VectorKernelFunctions.signBits($"embedding", 64, 16).as("kernel"),
      VectorFunctions.signProjectionBits($"embedding", 64, 16).as("reference"))
    both.collect().foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    }
  }

  test("shingle hash set: distinct, sorted, text-normalization invariant") {
    val df = Seq("a b c a b c a b", "  A  B   c a b C a B ").toDF("t")
    val sets = df.select(TextKernelFunctions.shingleHashSet($"t", 3)).collect()
      .map(_.getSeq[Long](0))
    assert(sets(0) == sets(1))        // same shingle set after normalization
    assert(sets(0) == sets(0).sorted) // canonical order
    assert(sets(0).size == 3)         // abc, bca, cab
    // short text → empty
    assert(Seq("a b").toDF("t").select(TextKernelFunctions.shingleHashSet($"t", 3))
      .head().getSeq[Long](0).isEmpty)
  }

  test("shingle strings: stride windows, declarative-reference equality") {
    val df = Seq("  The quick  Brown fox jumps ").toDF("t")
    // stride = n cuts disjoint token windows
    assert(df.select(TextKernelFunctions.shingleStrings($"t", 2, 2)).head()
      .getSeq[String](0) == Seq("the quick", "brown fox"))
    // stride 1 matches the declarative transform/slice form
    val kernel = df.select(TextKernelFunctions.shingleStrings($"t", 3)).head().getSeq[String](0)
    val declarative = df.select(graft.functions.TextFunctions.shingles($"t", 3))
      .head().getSeq[String](0)
    assert(kernel == declarative)
    // fewer tokens than n → empty
    assert(Seq("one two").toDF("t").select(TextKernelFunctions.shingleStrings($"t", 3))
      .head().getSeq[String](0).isEmpty)
  }

  test("token chunks and shingle strings: coverage invariants over fuzzed inputs") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val nTokens = rng.nextInt(40)
      val text = (1 to nTokens).map(i => s"w${rng.nextInt(9)}x$i").mkString(" ")
      val size = 1 + rng.nextInt(8)
      val stride = 1 + rng.nextInt(size)
      val toks = graft.functions.kernels.TextKernels.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val chunks = graft.functions.kernels.TextKernels.tokenChunks(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), size, stride)
        .map(_.toString)
      if (nTokens == 0) assert(chunks.isEmpty)
      else {
        // every token occurs in at least one chunk, in order; stitching
        // chunks at the stride boundary reproduces the token stream
        assert(chunks.head.split(" ").head == toks.head)
        assert(chunks.last.split(" ").last == toks.last)
        val stitched = chunks.zipWithIndex.flatMap { case (c, i) =>
          val ts = c.split(" ")
          if (i == 0) ts else ts.drop(size - stride)
        }
        assert(stitched.toSeq == toks.toSeq, s"n=$nTokens size=$size stride=$stride")
      }
      val windows = graft.functions.kernels.TextKernels.shingleStrings(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), size, stride)
      // full windows only: count matches the closed form; every window has
      // exactly `size` tokens
      val expected = if (nTokens < size) 0 else (nTokens - size) / stride + 1
      assert(windows.length == expected)
      assert(windows.forall(_.toString.split(" ").length == size))
    }
  }

  test("minhash signature: identical sets → identical sigs; empty → MaxValue") {
    val df = Seq("x y z w v", "x y z w v", "totally different words here now").toDF("t")
    val sigs = df.select(TextKernelFunctions.minhashSignature(
      TextKernelFunctions.shingleHashSet($"t", 2), 16)).collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).size == 16)
    val empty = Seq("x").toDF("t").select(TextKernelFunctions.minhashSignature(
      TextKernelFunctions.shingleHashSet($"t", 2), 4)).head().getSeq[Long](0)
    assert(empty.forall(_ == Long.MaxValue))
  }

  test("simhash kernel: formatting-invariant, near texts closer than far ones") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", "The  quick BROWN fox jumps over the lazy dog"),
      ("the quick brown fox jumps over the lazy dog", "completely unrelated content about engines")).toDF("a", "b")
    val rows = df.select(graft.operators.Dedup.hammingDistance(
      TextKernelFunctions.simhash64($"a"), TextKernelFunctions.simhash64($"b"))).collect()
    assert(rows(0).getInt(0) == 0)
    assert(rows(1).getInt(0) > 10)
  }

  test("subword count kernel matches the declarative lookaround-split reference") {
    val texts = Seq(
      "hello world", "abc123def", "  GPT-4 turbo v2  ", "", "   ",
      "one,two;three", "x9y8z7", "42", "a1 b2 c3", "snake_case camelCase2",
      "été café 2024", "!!!", "a", "3.14 is pi", "foo\tbar\nbaz")
    val df = texts.toDF("t")
    val reference = size(filter(
      split(lower(trim($"t")),
        "[^\\p{L}\\p{N}]+|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      t => length(t) > 0))
    val rows = df.select(TextKernelFunctions.subwordCount($"t"), reference).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch for '$t'")
    }
    // spot-check absolute values: runs split at letter<->digit transitions
    val direct = Seq("abc123def").toDF("t")
      .select(TextKernelFunctions.subwordCount($"t")).head().getInt(0)
    assert(direct == 3)
  }

  test("kernels are null-safe") {
    val df = Seq[(String, Option[String])](("a b c", None)).toDF("a", "b")
    val r = df.select(TextKernelFunctions.simhash64($"b"),
      TextKernelFunctions.shingleHashSet($"b", 2)).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("i8 quant stats: hand-computed codes, zero vector, null safety") {
    import graft.functions.kernels.VectorKernelFunctions
    val df = Seq(
      (1L, Some(Seq(1.0f, -0.5f, 0.25f, 0.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),
      (3L, None)).toDF("id", "vec")
    val rows = df.select($"id", VectorKernelFunctions.i8QuantStats($"vec").as("q"))
      .orderBy("id").select("id", "q.*").collect()
    // scale = 1/127; codes = floor(v/scale + 0.5) = [127, -63, 32, 0]
    val r1 = rows(0)
    assert(math.abs(r1.getAs[Double]("scale") - 1.0 / 127.0) < 1e-15)
    assert(r1.getAs[Int]("n_dims") == 4)
    assert(r1.getAs[Long]("sum_q") == 127L - 63L + 32L)
    assert(r1.getAs[Long]("sum_abs_q") == 127L + 63L + 32L)
    assert(r1.getAs[Int]("min_q") == -63 && r1.getAs[Int]("max_q") == 127)
    // zero vector → scale 0, all-zero codes
    val r2 = rows(1)
    assert(r2.getAs[Double]("scale") == 0.0 && r2.getAs[Long]("sum_abs_q") == 0L)
    assert(r2.getAs[Int]("min_q") == 0 && r2.getAs[Int]("max_q") == 0)
    // null vector → null struct
    assert(df.filter($"id" === 3L)
      .select(VectorKernelFunctions.i8QuantStats($"vec")).head().isNullAt(0))
  }

  test("l2 normalize kernel: unit norm, zero vector unchanged, null safe") {
    import graft.functions.kernels.VectorKernelFunctions
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),
      (3L, None)).toDF("id", "vec")
    val rows = df.select($"id", VectorKernelFunctions.l2Normalize($"vec").as("n"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Double](1) == Seq(0.6, 0.8))
    assert(rows(1).getSeq[Double](1) == Seq(0.0, 0.0)) // zero norm passes through
    assert(rows(2).isNullAt(1))
    // matches the declarative definition on the real embeddings table
    val emb = spark.read.parquet(sf("embeddings")).limit(50)
    val both = emb.select(
      VectorKernelFunctions.l2Normalize(col("embedding")).as("k"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")),
        x => x / sqrt(aggregate(
          org.apache.spark.sql.functions.transform(col("embedding"),
            y => y.cast("double") * y.cast("double")),
          lit(0.0), (a, b) => a + b))).as("r")).collect()
    both.foreach { r =>
      val kv = r.getSeq[Double](0); val rv = r.getSeq[Double](1)
      kv.zip(rv).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("numeric profile agg matches the declarative aggregates it replaced") {
    import graft.functions.kernels.NumericProfileAgg
    val df = spark.read.parquet(sf("lineitem"))
      .select(col("l_quantity").cast("double").as("v"))
    val k = df.agg(NumericProfileAgg.numericProfile(col("v"),
      Seq(0.25, 0.5, 0.75), 10).as("p")).select("p.*").head()
    val ref = df.agg(
      countDistinct(col("v")).as("d"),
      percentile(col("v"), lit(Array(0.25, 0.5, 0.75))).as("q"),
      min(col("v")).as("mn"), max(col("v")).as("mx")).head()
    assert(k.getAs[Long]("n_distinct") == ref.getAs[Long]("d"))
    assert(k.getAs[scala.collection.Seq[Double]]("percentiles") ==
      ref.getAs[scala.collection.Seq[Double]]("q"))
    assert(k.getAs[Double]("min") == ref.getAs[Double]("mn"))
    assert(k.getAs[Double]("max") == ref.getAs[Double]("mx"))
    // histogram matches the conditional-sum formulation bit for bit
    val lo = ref.getAs[Double]("mn"); val hi = ref.getAs[Double]("mx")
    val width = if (hi > lo) hi - lo else 1.0
    val idx = least(lit(9), greatest(lit(0),
      floor((col("v") - lit(lo)) / lit(width) * 10).cast("int")))
    val refHist = df.agg(array((0 until 10).map(i =>
      sum(when(idx === i, 1L).otherwise(0L))): _*).as("h"))
      .head().getAs[scala.collection.Seq[Long]]("h")
    assert(k.getAs[scala.collection.Seq[Long]]("hist") == refHist)
    // interpolation on a hand-checked multiset: {1,2,2,4}, p50 = 2.0,
    // p75 = (4-1)*0.75 = 2.25 → between 2 and 4 at frac 0.25 → 2.5
    val tiny = Seq(1.0, 2.0, 2.0, 4.0).toDF("v")
    val t = tiny.agg(NumericProfileAgg.numericProfile(col("v"),
      Seq(0.5, 0.75), 10).as("p")).select("p.*").head()
    assert(t.getAs[scala.collection.Seq[Double]]("percentiles") == Seq(2.0, 2.5))
    assert(t.getAs[Long]("n_distinct") == 3L)
    // all-null input → null struct
    val nul = Seq[Option[Double]](None, None).toDF("v")
    assert(nul.agg(NumericProfileAgg.numericProfile(col("v"),
      Seq(0.5), 10)).head().isNullAt(0))
  }

  test("i8 quant codes bound by ±127 on the real embeddings table") {
    import graft.functions.kernels.VectorKernelFunctions
    val stats = spark.read.parquet(sf("embeddings"))
      .select(VectorKernelFunctions.i8QuantStats(col("embedding")).as("q"))
      .select("q.*")
    val bad = stats.filter(col("min_q") < -127 || col("max_q") > 127 ||
      col("max_q") < col("min_q")).count()
    assert(bad == 0L)
    // the max-magnitude element always quantizes to exactly ±127
    val hitsEdge = stats.filter(col("max_q") === 127 || col("min_q") === -127).count()
    assert(hitsEdge == stats.count())
  }

  test("pq_lut cells agree with nearest_centroid's distances on real vectors") {
    // with one subspace covering the whole vector, argmin over the LUT row
    // must equal the nearest-centroid assignment (same left-to-right
    // accumulation contract), and the minimum cell must be the exact
    // squared L2 to that centroid
    val emb = spark.read.parquet(sf("embeddings")).limit(50)
      .select($"vec_id", slice($"embedding", 1, 8).as("v"))
    val cents = emb.filter($"vec_id" < 4).orderBy($"vec_id")
      .select($"v").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val cbs = Array(cents) // m = 1
    val rows = emb.select(
        VectorKernelFunctions.nearestCentroid($"v", cents).as("assigned"),
        VectorKernelFunctions.pqLut($"v", cbs).as("lut"))
      .collect()
    rows.foreach { r =>
      val lutRow = r.getSeq[scala.collection.Seq[Double]](1).head
      val argmin = lutRow.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(argmin == r.getInt(0),
        s"LUT argmin $argmin != nearest_centroid ${r.getInt(0)}: $lutRow")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpecBase {

  test("leakage-safe split invariant holds on the real documents table") {
    import org.apache.spark.sql.functions.col
    val real = spark.read.parquet(sf("documents"))
    val split = graft.operators.Sampling.leakageSafeSplit(real, "doc_id", "text",
      Seq("train" -> 0.8, "test" -> 0.2), threshold = 0.7)
      .select(col("doc_id"), col("split"))
    val pairs = graft.operators.Dedup.minhashLsh(real, "doc_id", "text",
      threshold = 0.7).select(col("id_a"), col("id_b"))
    val a = split.select(col("doc_id").as("id_a"), col("split").as("split_a"))
    val b = split.select(col("doc_id").as("id_b"), col("split").as("split_b"))
    val violations = pairs.join(a, "id_a").join(b, "id_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(violations.isEmpty, "a near-dup pair crossed the split boundary")
  }

  test("leakage-safe split keeps near-duplicates on the same side") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "completely different content about spark query engines and columnar formats"),
      (5L, "another unrelated document discussing parquet file layouts and row groups"))
      .toDF("doc_id", "text")
    val out = graft.operators.Sampling.leakageSafeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.5, "test" -> 0.5), threshold = 0.5,
      numBands = 16)
      .select("doc_id", "component", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // docs 1-3 near-duplicate each other → one component, one side
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1)
    // singletons keep their own component label
    assert(out(4L)._1 == 4L && out(5L)._1 == 5L)
    assert(out.size == 5)
  }
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("hashSplit covers every row exactly once and is deterministic") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(docs, "doc_id", splits)
    assert(a.count() == docs.count())
    assert(a.filter(!$"split".isin("train", "val", "test")).isEmpty)
    val b = Sampling.hashSplit(docs.repartition(7), "doc_id", splits)
    // membership is a pure function of the id — repartitioning changes nothing
    assert(a.select("doc_id", "split").exceptAll(b.select("doc_id", "split")).isEmpty)
  }

  test("hashSplit weights are honored within sampling tolerance") {
    val n = docs.count().toDouble
    val counts = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // 500 Bernoulli draws: allow ±6 percentage points (≈3.3σ at p=0.1)
    assert(math.abs(counts("train") / n - 0.8) < 0.06)
    assert(math.abs(counts("val") / n - 0.1) < 0.06)
    assert(math.abs(counts("test") / n - 0.1) < 0.06)
  }

  test("hashSample nests: a smaller fraction is a subset of a larger one") {
    val small = Sampling.hashSample(docs, "doc_id", 0.2)
    val large = Sampling.hashSample(docs, "doc_id", 0.6)
    assert(small.select("doc_id").exceptAll(large.select("doc_id")).isEmpty)
    assert(small.count() < large.count())
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("different salts draw different samples") {
    val a = Sampling.hashSample(docs, "doc_id", 0.5, salt = "a:")
    val b = Sampling.hashSample(docs, "doc_id", 0.5, salt = "b:")
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() > 0)
  }

  test("weightedMixture unions per-source samples by name") {
    val en = docs.filter($"lang" === "en")
    val rest = docs.filter($"lang" =!= "en")
    val mix = Sampling.weightedMixture(Seq(en -> 1.0, rest -> 0.0), "doc_id")
    // rate 1.0 keeps everything, rate 0.0 keeps ~nothing (bucket < '0000')
    assert(mix.filter($"lang" === "en").count() == en.count())
    assert(mix.filter($"lang" =!= "en").isEmpty)
  }

  test("quotaPerGroup keeps top-k per group in the given order") {
    val out = Sampling.quotaPerGroup(docs, Seq("source"),
      Seq($"n_chars".desc, $"doc_id".asc), k = 2)
    val sizes = out.groupBy("source").count()
    assert(sizes.filter($"count" > 2).isEmpty)
    // each kept row must be in its group's true top-2 by (n_chars desc, id)
    val expected = docs.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)))
      .filter($"rk" <= 2).select("source", "doc_id")
    assert(out.select("source", "doc_id").exceptAll(expected).isEmpty)
    assert(out.filter($"quota_rank" < 1 || $"quota_rank" > 2).isEmpty)
  }

  test("quotaPerGroup heap path equals the window path exactly") {
    val order = Seq($"n_chars".desc, $"doc_id".asc) // total order → deterministic
    val heap = Sampling.quotaPerGroup(docs, Seq("source"), order, k = 5)
    val window = Sampling.quotaPerGroup(docs, Seq("source"), order, k = 5, heap = false)
    assert(heap.columns.toSeq === window.columns.toSeq)
    assert(heap.exceptAll(window).isEmpty && window.exceptAll(heap).isEmpty)
  }

  test("quotaPerGroup heap path: partial (map-side) aggregation, no window sort") {
    val plan = Sampling.quotaPerGroup(docs, Seq("source"),
        Seq($"n_chars".desc, $"doc_id".asc), k = 3)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // pass before the exchange — at most k rows per group per partition
    // reach the shuffle, and no full per-group sort happens anywhere
    assert(plan.contains("ObjectHashAggregate"), s"expected heap aggregate:\n$plan")
    assert(plan.contains("partial_top_k_rows"), s"expected map-side partial agg:\n$plan")
    assert(!plan.contains("Window"), s"heap path must not fall back to a window:\n$plan")
  }

  test("quotaPerGroup heap path ranks null sort keys last") {
    val df = Seq(
      ("g", Some(10L), 1L), ("g", None, 2L), ("g", Some(5L), 3L)
    ).toDF("grp", "score", "id")
    val out = Sampling.quotaPerGroup(df, Seq("grp"), Seq($"score".desc, $"id".asc), k = 2)
      .select($"id", $"quota_rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out === Seq((1L, 1), (3L, 2))) // the null-score row was evicted first
  }

  test("heap and window paths pick identical rows when sort keys are null") {
    // .asc's direction-default is NULLS FIRST; the window path normalizes
    // to nulls-last so the heap flag stays a pure performance switch
    val df = Seq(
      ("g", Some(10L), 1L), ("g", None, 2L), ("g", Some(5L), 3L),
      ("h", None, 4L), ("h", Some(7L), 5L)
    ).toDF("grp", "score", "id")
    for (order <- Seq(Seq($"score".desc, $"id".asc), Seq($"score".asc, $"id".asc))) {
      val heap = Sampling.quotaPerGroup(df, Seq("grp"), order, k = 1)
        .select($"grp", $"id", $"quota_rank").collect().toSet
      val window = Sampling.quotaPerGroup(df, Seq("grp"), order, k = 1, heap = false)
        .select($"grp", $"id", $"quota_rank").collect().toSet
      assert(heap == window, s"paths diverged for $order")
    }
  }

  test("stratifiedSample applies per-stratum fractions deterministically") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5), defaultFraction = 0.0)
    val bySource = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource("src0") == full("src0")) // fraction 1.0 keeps ALL rows
    assert(bySource.getOrElse("src1", 0L) < full("src1"))
    assert(!bySource.keySet.exists(s => s != "src0" && s != "src1")) // default 0 drops rest
    // determinism under repartitioning
    val again = Sampling.stratifiedSample(docs.repartition(7), "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5))
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // per-stratum nesting: a larger fraction is a superset
    val more = Sampling.stratifiedSample(docs, "doc_id", "source", Map("src1" -> 0.8))
    assert(out.filter($"source" === "src1").select("doc_id")
      .exceptAll(more.select("doc_id")).isEmpty)
  }

  test("stratifiedSample is a pure scan filter — no shuffle") {
    val plan = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 0.5), defaultFraction = 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sample must not shuffle:\n$plan")
  }

  test("epochMixture: rate 2.5 = two full copies plus a half sample") {
    val n = docs.count()
    val out = Sampling.epochMixture(Seq(docs -> 2.5), "doc_id").cache()
    val byEpoch = out.groupBy("epoch").count().as[(Int, Long)].collect().toMap
    assert(byEpoch(0) == n && byEpoch(1) == n)
    assert(byEpoch(2) > 0 && byEpoch(2) < n)
    // the fractional epoch is exactly the hashSample at the same salt
    val frac = Sampling.hashSample(docs, "doc_id", 0.5)
    assert(out.filter($"epoch" === 2).select("doc_id")
      .exceptAll(frac.select("doc_id")).isEmpty)
    // integer rate has no fractional epoch; sub-1 rate is pure downsample
    assert(Sampling.epochMixture(Seq(docs -> 2.0), "doc_id")
      .agg(max($"epoch")).head().getInt(0) == 1)
    assert(Sampling.epochMixture(Seq(docs -> 0.4), "doc_id")
      .agg(max($"epoch")).head().getInt(0) == 0)
    out.unpersist()
  }

  test("epochMixture plan is scan unions — no shuffle, no materialization") {
    val plan = Sampling.epochMixture(Seq(docs -> 2.5), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epoch mixture must not shuffle:\n$plan")
  }

  test("uniformPerGroup: k per group by hash rank, deterministic, unbiased order") {
    val out = Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", k = 5)
    val counts = out.groupBy("source").count().as[(String, Long)].collect()
    val full = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    counts.foreach { case (s, n) => assert(n == math.min(5L, full(s))) }
    assert(out.columns.contains("sample_rank") && !out.columns.contains("__rk"))
    // deterministic under repartitioning
    val again = Sampling.uniformPerGroup(docs.repartition(7), Seq("source"), "doc_id", k = 5)
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // a different salt draws a different sample
    val other = Sampling.uniformPerGroup(docs, Seq("source"), "doc_id", k = 5, salt = "x:")
    assert(out.select("doc_id").exceptAll(other.select("doc_id")).count() > 0)
  }

  test("heap path honors nulls-last requests, rejects desc_nulls_first") {
    val df = Seq(("g", Some(10L), 1L), ("g", None, 2L), ("g", Some(5L), 3L))
      .toDF("grp", "score", "id")
    // desc_nulls_last is exactly what the heap implements — accepted
    val ok = Sampling.quotaPerGroup(df, Seq("grp"),
      Seq($"score".desc_nulls_last, $"id".asc), k = 2)
      .select($"id").as[Long].collect().sorted
    assert(ok.toSeq == Seq(1L, 3L))
    // desc_nulls_first cannot be honored — loud failure, not silent flip
    intercept[IllegalArgumentException] {
      Sampling.quotaPerGroup(df, Seq("grp"),
        Seq($"score".desc_nulls_first, $"id".asc), k = 2).collect()
    }
  }

  test("weightedMixture rejects upsampling rates, pointing at epochMixture") {
    intercept[IllegalArgumentException] {
      Sampling.weightedMixture(Seq(docs -> 2.0), "doc_id")
    }
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("temperatureMixture: rarest group kept whole, others at (nmin/n)^(1-a)") {
    import spark.implicits._
    val corpus = ((1L to 80L).map(i => (i, "big")) ++
      (81L to 100L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val out = Sampling.temperatureMixture(corpus, "doc_id", "grp",
      alpha = 0.5, salt = "s:")
    val rows = out.select("doc_id", "grp", "keep_rate").collect()
    // rarest group: rate exactly 1, every row kept
    val small = rows.filter(_.getString(1) == "small")
    assert(small.length == 20 && small.forall(_.getDouble(2) == 1.0))
    // big group: rate = (20/80)^0.5 = 0.5; membership ≡ hashSample at 0.5
    val big = rows.filter(_.getString(1) == "big")
    assert(big.forall(_.getDouble(2) == 0.5))
    val expected = Sampling.hashSample(
        corpus.filter(col("grp") === "big"), "doc_id", 0.5, salt = "s:")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(big.map(_.getLong(0)).toSet == expected)
    // alpha = 1 keeps the natural distribution: every row survives
    assert(Sampling.temperatureMixture(corpus, "doc_id", "grp", alpha = 1.0)
      .count() == 100L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(corpus, "doc_id", "grp", alpha = 0.0)
    }
  }

  test("tokenBudgetPerGroup: inclusive cap, best-first, never overshoots") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 40L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 10L),
      ("b", 5L, 200L), // single row over budget: dropped entirely
      ("c", 6L, 50L)).toDF("grp", "id", "cost")
    val out = Sampling.tokenBudgetPerGroup(rows, Seq("grp"),
      Seq(col("cost").desc, col("id").asc), "cost", budget = 100L)
      .orderBy("id").collect()
    // group a: 40 + 30 + 30 = 100 kept (inclusive), id 4 would overshoot
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 6L))
    assert(out.map(_.getAs[Long]("budget_used")).toSeq == Seq(40L, 70L, 100L, 50L))
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerGroup(rows, Seq("grp"), Seq(col("id").asc), "cost", 0L)
    }
  }

  test("split/sample plans are pure scan+filter/projection — no shuffle") {
    val splitPlan = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    val samplePlan = Sampling.hashSample(docs, "doc_id", 0.3)
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"), s"hashSplit shuffles:\n$splitPlan")
    assert(!samplePlan.contains("Exchange"), s"hashSample shuffles:\n$samplePlan")
  }

  test("dsirWeights: hand-computed log-likelihood ratios; empty doc gets null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa", "en"),   // bucket(aa) = (2*31+97) % 4 = 3, target side
      (2L, "bb", "de"),      // bucket(bb) = (2*31+98) % 4 = 0, raw side
      (3L, "", "de")         // no tokens -> null weight
    ).toDF("doc_id", "text", "lang")
    val out = Sampling.dsirWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en", numBuckets = 4)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    // llr(b3) = ln((2+1)/(2+4)) - ln((0+1)/(1+4)) = ln(2.5); doc1 = 2*ln(2.5)
    val w1 = out(1L)._2.get.asInstanceOf[Double]
    assert(math.abs(w1 - 2.0 * math.log(2.5)) < 1e-5, s"doc1 weight: $w1")
    // llr(b0) = ln((0+1)/(2+4)) - ln((1+1)/(1+4)) = ln(5/12)
    val w2 = out(2L)._2.get.asInstanceOf[Double]
    assert(math.abs(w2 - math.log(5.0 / 12.0)) < 1e-5, s"doc2 weight: $w2")
    assert(out(1L)._1.contains(2L) && out(2L)._1.contains(1L))
    assert(out(3L) == ((None, None)), "empty doc must surface with null weight")
  }

  test("gumbelTopK: deterministic, k-bounded, biased toward high logits") {
    import spark.implicits._
    // ids 0..199 with logit = +3 for even ids, -3 for odd: exp(6) ≈ 400×
    // odds ratio, so the 50 winners should be overwhelmingly even
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) 3.0 else -3.0))
      .toDF("id", "logit")
    val a = Sampling.gumbelTopK(df, "id", "logit", k = 50, salt = "t:")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.gumbelTopK(df, "id", "logit", k = 50, salt = "t:")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt must reproduce the same sample")
    assert(a.size == 50)
    val evens = a.count(_ % 2 == 0)
    assert(evens >= 45, s"selection should strongly favor the high logits: $evens/50")
    val c = Sampling.gumbelTopK(df, "id", "logit", k = 50, salt = "other:")
      .collect().map(_.getLong(0)).toSet
    assert(c != a, "different salt must draw a different sample")
  }

  test("wordDropout: deterministic, order-preserving, ~p of tokens dropped") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("documents"))
    val a = Sampling.wordDropout(docs, "doc_id", "text", p = 0.1)
    val b = Sampling.wordDropout(docs, "doc_id", "text", p = 0.1)
    val ra = a.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(ra == b.collect().map(r => r.getLong(0) -> r.getString(3)).toMap,
      "same salt must reproduce the same augmentation")
    val tot = a.agg(sum($"n_orig"), sum($"n_kept")).head()
    val dropped = 1.0 - tot.getLong(1).toDouble / tot.getLong(0)
    assert(dropped > 0.05 && dropped < 0.15, s"drop rate off target: $dropped")
    // surviving tokens must be a subsequence of the original token stream
    val one = docs.select($"doc_id", $"text").limit(1).head()
    val orig = one.getString(1).toLowerCase.trim.split("\\s+").toSeq
    val aug = ra(one.getLong(0)).split(" ").toSeq.filter(_.nonEmpty)
    var i = 0
    for (t <- aug) {
      while (i < orig.length && orig(i) != t) i += 1
      assert(i < orig.length, s"augmented token '$t' out of order")
      i += 1
    }
    // different salt -> different epoch
    val c = Sampling.wordDropout(docs, "doc_id", "text", p = 0.1, salt = "wd2:")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(c != ra)
  }

  test("dsirWeights: target-like documents outscore off-target ones on real data") {
    val docs = spark.read.parquet(sf("documents"))
    val out = Sampling.dsirWeights(docs, "doc_id", "text",
      isTarget = col("lang") === "en")
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
    val avg = out.groupBy(col("lang")).agg(org.apache.spark.sql.functions.avg(col("dsir_weight")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avg("en") > avg("zh"), s"en should score above zh: $avg")
  }

  test("downsampleToBalance: min-class quota, deterministic md5 selection") {
    import spark.implicits._
    val df = ((1L to 5L).map(i => (i, "a")) ++ (6L to 8L).map(i => (i, "b")) ++
      (9L to 10L).map(i => (i, "c"))).toDF("id", "cls")
    val out = Sampling.downsampleToBalance(df, "cls", "id")
    val byClass = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byClass == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // selection matches a manual md5 ranking of class 'a'
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long): String = md.digest(s"balance|$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expectA = (1L to 5L).sortBy(i => (h(i), i)).take(2).toSet
    val gotA = out.filter(col("cls") === "a").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(gotA == expectA, s"got $gotA expected $expectA")
    // reruns agree (pure function of ids + salt)
    val again = Sampling.downsampleToBalance(df, "cls", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
    // a different salt may pick a different (same-sized) subset
    val salted = Sampling.downsampleToBalance(df, "cls", "id", salt = "v2")
    assert(salted.count() == 6L)
    // null classes drop
    val withNull = df.union(Seq((99L, null.asInstanceOf[String])).toDF("id", "cls"))
    assert(Sampling.downsampleToBalance(withNull, "cls", "id").count() == 6L)
  }

  test("rakeWeights: symmetric fixed point is exact; margins converge; guards") {
    import spark.implicits._
    def cellRows(cells: Seq[(String, String, Int)]) =
      cells.flatMap { case (r, c, n) => Seq.fill(n)((r, c)) }
        .toDF("lang", "src")
    // balanced 2x2 with equal margins: IPF is already at its fixed point,
    // so every per-doc weight is exactly 1
    val bal = cellRows(Seq(("a", "x", 20), ("a", "y", 10),
      ("b", "x", 10), ("b", "y", 20)))
    val wb = Sampling.rakeWeights(bal, "lang", "src",
      Seq("a" -> 0.5, "b" -> 0.5)).collect()
    assert(wb.length == 4)
    wb.foreach { r =>
      assert(r.getAs[Double]("weight") == 1.0)
      assert(math.abs(r.getAs[Double]("cell_share") -
        r.getAs[Long]("n") / 60.0) < 1e-12)
    }
    // skewed table: after 5 rounds both margins hit their targets
    val skew = cellRows(Seq(("a", "x", 30), ("a", "y", 10),
      ("b", "x", 10), ("b", "y", 50)))
    val ws = Sampling.rakeWeights(skew, "lang", "src",
      Seq("a" -> 0.5, "b" -> 0.5)).collect()
    val rowShare = ws.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("cell_share")).sum }
    val colShare = ws.groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("cell_share")).sum }
    rowShare.values.foreach(v => assert(math.abs(v - 0.5) < 1e-3,
      s"row margins: $rowShare"))
    colShare.values.foreach(v => assert(math.abs(v - 0.5) < 1e-3,
      s"col margins: $colShare"))
    // guards: uncovered observed key, shares not summing to 1, cell cap
    intercept[IllegalArgumentException] {
      Sampling.rakeWeights(bal, "lang", "src", Seq("a" -> 1.0)).collect()
    }
    intercept[IllegalArgumentException] {
      Sampling.rakeWeights(bal, "lang", "src",
        Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.rakeWeights(bal, "lang", "src",
        Seq("a" -> 0.5, "b" -> 0.5), maxCells = 2).collect()
    }
    // a share on a NEVER-OBSERVED key makes the row and column targets
    // inconsistent (rows sum to 0.8*n, columns to n) — IPF would
    // oscillate forever instead of converging; must fail loudly
    val e = intercept[IllegalArgumentException] {
      Sampling.rakeWeights(bal, "lang", "src",
        Seq("a" -> 0.4, "b" -> 0.4, "ghost" -> 0.2)).collect()
    }
    assert(e.getMessage.contains("never observed"),
      s"expected the inconsistent-margin guard, got: ${e.getMessage}")
  }

  test("neymanAllocation: n_h ~ N_h*s_h, zero-variance strata get 0, clamp") {
    import spark.implicits._
    // stratum A: 4 rows, sd = sqrt(20/3); B: 2 rows sd = 0 (constant);
    // C: 8 rows, sd(0,8 repeated) larger weight
    val d = (Seq.fill(1)(("A", 1L)) ++ Seq(("A", 3L), ("A", 5L), ("A", 7L))
      ++ Seq(("B", 4L), ("B", 4L))
      ++ (1 to 4).flatMap(_ => Seq(("C", 0L), ("C", 8L))))
      .toDF("s", "v")
    val out = Sampling.neymanAllocation(d, "s", "v", budget = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(4))).toMap
    val sdA = math.sqrt((84.0 - 16.0 * 16 / 4) / 3) // values 1,3,5,7
    val sdC = math.sqrt((8 * 64.0 / 2 - 32.0 * 32 / 8) / 7)
    assert(math.abs(out("A")._2 - sdA) < 1e-12)
    assert(out("B")._2 == 0.0 && out("B")._3 == 0L,
      "zero-variance stratum allocates nothing")
    val wA = 4 * sdA; val wC = 8 * sdC
    val allocA = math.round(10 * wA / (wA + wC))
    assert(out("A")._3 == allocA, s"A alloc: ${out("A")} vs $allocA")
    // clamp: a huge budget cannot allocate more than the stratum size
    val big = Sampling.neymanAllocation(d, "s", "v", budget = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(big("A") == 4L && big("C") == 8L)
  }

  test("designEffect: Kish deff, cell and per-unit forms agree") {
    // equal weights cost nothing: deff 1, n_eff = n
    val eq = Seq.fill(8)(1.5).toDF("w")
    val re = Sampling.designEffect(eq, "w").collect().head
    assert(math.abs(re.getAs[Double]("deff") - 1.0) < 1e-9)
    assert(math.abs(re.getAs[Double]("n_eff") - 8.0) < 1e-9)
    assert(math.abs(re.getAs[Double]("cv_weights")) < 1e-4)
    // textbook: half the units at w=2, half at w=1 ->
    // deff = n*sum(w^2)/sum(w)^2 = 4*(4+4+1+1)/36 = 10/9
    val uneq = Seq(2.0, 2.0, 1.0, 1.0).toDF("w")
    val ru = Sampling.designEffect(uneq, "w").collect().head
    assert(math.abs(ru.getAs[Double]("deff") - 10.0 / 9) < 1e-9)
    assert(math.abs(ru.getAs[Double]("n_eff") - 3.6) < 1e-9)
    assert(math.abs(ru.getAs[Double]("cv_weights") -
      math.sqrt(1.0 / 9)) < 1e-9)
    // the cell form (count col) must equal the expanded per-unit form
    val cells = Seq((3L, 2.0), (5L, 0.8)).toDF("n", "w")
    val rc = Sampling.designEffect(cells, "w", Some("n")).collect().head
    val flat = (Seq.fill(3)(2.0) ++ Seq.fill(5)(0.8)).toDF("w")
    val rf = Sampling.designEffect(flat, "w").collect().head
    assert(rc.getAs[Long]("n_units") == 8L)
    assert(math.abs(rc.getAs[Double]("deff") -
      rf.getAs[Double]("deff")) < 1e-9)
    // zero/empty weight mass -> NULL stats
    val z = Sampling.designEffect(Seq(0.0, 0.0).toDF("w"), "w")
      .collect().head
    assert(z.isNullAt(z.fieldIndex("deff")))
  }
}

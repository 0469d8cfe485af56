package graft

/** Plan-shape assertions: the optimizations we rely on at 100 TB must be
  * visible in the physical plan, not assumed. */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("filter expression is pushed into the parquet scan") {
    val p = plan("q02_filter_expression")
    assert(p.contains("PushedFilters") && p.contains("l_quantity"))
  }

  test("projection prunes the scan schema") {
    val p = plan("q04_project_index")
    // ReadSchema carries only the four projected columns, not l_comment etc.
    assert(p.contains("l_orderkey") && !p.contains("l_shipdate"))
  }

  test("dimension joins broadcast, fact side does not shuffle for the join") {
    assert(plan("q06_join_broadcast_part").contains("BroadcastHashJoin"))
    assert(plan("q05_join_revenue_nation").contains("BroadcastHashJoin"))
  }

  test("aggregations are partial (map-side combine before the shuffle)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial"), s"no partial aggregation in:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q07_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("queries stay on codegen'd paths — no interpreted lambda hot spots") {
    // the rewritten text/vector pipelines must not contain higher-order
    // function nodes in their plans (kernels replaced them). The dedup
    // operators run here with materialize = false — the catalog's
    // materialize = true would collapse their plan to a checkpoint scan
    // and make this assert vacuous.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plans = Seq(
      "minhashLsh" -> graft.operators.Dedup.minhashLsh(
        docs, "doc_id", "text", numBands = 16, threshold = 0.7)
        .queryExecution.executedPlan.toString,
      "simhashNearDup" -> graft.operators.Dedup.simhashNearDup(
        docs, "doc_id", "text", threshold = 0.8)
        .queryExecution.executedPlan.toString,
      "q21_knn_bruteforce" -> plan("q21_knn_bruteforce"),
      "q28_fingerprint" -> plan("q28_fingerprint"))
    for ((q, p) <- plans) {
      assert(!p.contains("ArrayFilter") && !p.contains("ArrayAggregate") &&
             !p.contains("ArrayTransform"),
        s"$q still uses interpreted higher-order functions")
    }
    spark.catalog.clearCache()
  }

  test("q28 fingerprints are one scan-projection: no shuffle before the sort") {
    val p = plan("q28_fingerprint")
    // exactly one Exchange — the rangepartitioning for the final orderBy;
    // shingling/md5 must not introduce any other
    assert("Exchange".r.findAllIn(p).size == 1, s"unexpected shuffles in:\n$p")
  }

  test("IVF list assignment is a pure projection (no shuffle, no UDF)") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cts = graft.operators.Similarity.trainCentroids(emb, "embedding", 4, sampleSize = 256)
    val p = graft.operators.Similarity.assignToLists(emb, "embedding", cts)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"assignment shuffles:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"assignment runs a UDF:\n$p")
  }

  test("fingerprint compare is partial-aggregated (map-side combine)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    // capture the agg plan via the public API path: compare runs the agg
    // internally, so assert on an equivalent fingerprint aggregation plan
    import org.apache.spark.sql.functions._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val p = df.agg(sum(xxhash64(col("r_name")).cast(dec)), count(col("r_name")))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial"), s"no partial aggregation in:\n$p")
  }

  test("top-ngrams compiles to TakeOrderedAndProject over a partial agg") {
    val p = plan("q71_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
    assert(p.contains("partial"), s"no partial aggregation in:\n$p")
    assert(!p.contains("ArrayTransform"),
      "ngram strings must come from the compiled kernel, not transform()")
  }

  test("bm25 broadcasts the query side; corpus is never shuffled whole") {
    val p = plan("q72_bm25_search")
    assert(p.contains("BroadcastHashJoin"), s"vocabulary join must broadcast:\n$p")
    // the only exchanges: posting agg on (term, doc), the per-query rank
    // window, and the final orderBy — never a corpus-keyed join shuffle
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffled join:\n$p")
  }

  test("line dedup shuffles line hashes and doc ids, never a cross join") {
    val p = plan("q69_line_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unexpected product join in:\n$p")
  }

  test("document chunking is scan-local: explode with no shuffle before sort") {
    val p = plan("q74_chunk_documents")
    // exactly one Exchange — the rangepartitioning for the final orderBy
    assert("Exchange".r.findAllIn(p).size == 1, s"unexpected shuffles in:\n$p")
    assert(p.contains("Generate"), s"expected posexplode in:\n$p")
  }

  test("temperature mixture broadcasts rates; corpus side never shuffles") {
    val p = plan("q84_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$p")
  }

  test("i8 quantization is a pure scan projection plus the final sort") {
    val p = plan("q85_quantize_i8")
    // exactly one Exchange — the rangepartitioning for the final orderBy
    assert("Exchange".r.findAllIn(p).size == 1, s"unexpected shuffles in:\n$p")
    assert(!p.contains("ArrayTransform") && !p.contains("ArrayAggregate"),
      "quant stats must come from the compiled kernel, not higher-order fns")
  }

  test("inverted index and novelty aggregate partially before their shuffles") {
    for (q <- Seq("q86_inverted_index", "q88_novelty_score")) {
      val p = plan(q)
      assert(p.contains("partial"), s"$q: no partial aggregation in:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: unexpected product join in:\n$p")
    }
  }

  test("centroid outlier scoring broadcasts the centroid table") {
    val p = plan("q87_centroid_outliers")
    assert(p.contains("BroadcastHashJoin"), s"centroids must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$p")
  }

  test("funnel pushes the stage filter to the scan; depth stays codegen'd") {
    val p = plan("q98_funnel")
    assert(p.contains("PushedFilters") && p.contains("In(event_type"),
      s"stage membership must push into the scan:\n$p")
    assert(!p.contains("ArrayFilter") && !p.contains("ArrayTransform"),
      s"funnel depth must not fall back to interpreted lambdas:\n$p")
  }

  test("weighted sampling is TakeOrderedAndProject, not a global sort") {
    val p = plan("q102_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"expected bounded top-k:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"sample must not range-shuffle the corpus:\n$p")
  }

  test("psi bin edges broadcast; histogram aggregates partially") {
    val p = plan("q101_psi_drift")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row min/max frame must broadcast:\n$p")
    assert(p.contains("partial"), s"bin counts must map-side combine:\n$p")
  }

  test("constraint validation: row rules share one scan, unique adds one") {
    val p = plan("q108_validate")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans <= 2, s"expected <= 2 scans (row-rule pass + unique), got $scans:\n$p")
  }

  test("scd2 and transition windows are keyed, never global") {
    assert(plan("q110_scd2_history").contains("windowspecdefinition(o_custkey"))
    assert(plan("q112_event_transitions").contains("windowspecdefinition(user_id"))
  }

  test("rollup is one Expand + one aggregation, not one scan per level") {
    val p = plan("q113_rollup")
    assert(p.contains("Expand"), s"rollup must plan an Expand:\n$p")
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans == 1, s"rollup must read the input once, got $scans scans")
  }

  test("basket lift joins stay equi-joins — no product over baskets") {
    val p = plan("q121_basket_lift")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("quantile bins are a literal-compare projection, not an ntile window") {
    // exact bounds resolve driver-side (ExactQuantiles) and inline as
    // LITERALS: the assignment plan is a bare scan + projection — no
    // window, no join of any kind (the r8 upgrade over the previous
    // broadcast-compare shape)
    val p = plan("q116_quantile_bins")
    assert(!p.contains("Window"), s"bucketing must not plan a window:\n$p")
    assert(!p.contains("Join"), s"bucketing must not plan a join:\n$p")
    assert(p.contains("CASE WHEN"), s"bucket compare missing:\n$p")
  }

  test("windowed funnel keeps the pushed stage filter and compiled kernel") {
    val p = plan("q133_funnel_within")
    assert(p.contains("PushedFilters") && p.contains("In(event_type"))
    assert(p.contains("funnel_depth_within"), s"kernel missing from plan:\n$p")
  }

  test("char-LM scoring broadcasts both model probes; no corpus-side shuffle join") {
    val p = plan("q145_charlm_score")
    assert(p.contains("BroadcastHashJoin"), s"LM probes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the LM join:\n$p")
  }

  test("fuzzy linkage joins on the blocking key — no cartesian, no nested loop") {
    val p = plan("q142_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked join must be an equi-join:\n$p")
  }

  test("heavy-hitters sketch aggregates partially (map-side combine)") {
    val p = plan("q151_heavy_sketch")
    assert(p.contains("partial_space_saving_sketch"),
      s"sketch must combine map-side before the exchange:\n$p")
  }

  test("KMV sketch aggregates partially; estimate needs no second scan") {
    val p = plan("q284_kmv_distinct")
    assert(p.contains("partial_kmv_minima"),
      s"KMV minima must combine map-side before the exchange:\n$p")
  }

  test("jaro-winkler pairs join on the prefix block — equi-join, kernel in plan") {
    val p = plan("q286_jaro_winkler")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocked JW pairs must be an equi-join:\n$p")
    assert(p.contains("jaro_winkler"),
      s"the compiled kernel must appear, not a UDF:\n$p")
  }

  test("KN bigram LM: corpus-side extraction is scan-local; model joins are equi") {
    val p = plan("q298_kn_bigram")
    assert(!p.contains("CartesianProduct"),
      s"KN scoring must never go cartesian:\n$p")
    // bigram extraction zips in-plan: a Generate above the scan, no join
    // between the text scan and the first aggregation
    assert(p.contains("Generate explode"),
      s"bigrams must come from an in-plan zip, not a positional self-join:\n$p")
  }

  test("ranking metrics windows are partitioned by the query key") {
    val df = SparkEntry.queries("q276_ndcg")(spark, "/root/testdata/sf0.001")
    val bad = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "q276 must not plan a partition-less window")
  }

  test("multi-touch attribution candidates come from an equi-join on the bucket") {
    val p = plan("q147_multitouch")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must bucketize to an equi-join:\n$p")
  }

  test("winnowing shuffles are keyed (doc window + fp distinct), kernel in plan") {
    val p = plan("q143_winnow")
    assert(p.contains("shingle_strings"), s"compiled shingle kernel missing:\n$p")
    assert(!p.toLowerCase.contains("arrayfilter") && !p.toLowerCase.contains("arraytransform"),
      s"no interpreted lambda may remain in the winnow path:\n$p")
  }

  test("ks statistic runs a distributed CDF — no single-partition global window") {
    // q171 drives ksStatistic on a continuous column (distinct ≈ rows):
    // every Window in the plan must be keyed by the range-partition id;
    // an unkeyed Window would plan Exchange SinglePartition and serialize
    // the whole distinct-value table through one task
    val p = plan("q171_ks_continuous")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, s"expected the per-partition running-sum windows in:\n$p")
    windows.foreach { w =>
      assert(w.contains("_pid"), s"global (unpartitioned) window in ks plan:\n$w")
    }
  }

  test("hive-partitioned events scan prunes to the filtered day") {
    val p = plan("q172_partition_prune")
    assert(p.contains("PartitionFilters: ["), s"no partition filters in:\n$p")
    val pf = p.linesIterator.find(_.contains("PartitionFilters:")).get
    assert(pf.contains("event_date"),
      s"event_date predicate must resolve against directory names:\n$pf")
  }

  test("interaction grid: one-pass explode, partial agg, broadcast bounds") {
    val p = plan("q174_interaction_grid")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"bin counts must combine map-side before the shuffle:\n$p")
    // bounds come from a broadcast 1-row aggregate, not a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"min/max bounds must broadcast:\n$p")
    assert(p.contains("struct<event_id:bigint,user_id:bigint,value:double>"),
      s"scan must prune to the three profiled columns:\n$p")
  }

  test("q184 stored-corpus probe: no exchange above the corpus-side scans") {
    // the 100 TB incremental-dedup claim, proven in the plan: with the
    // corpus LSH store precomputed as bucketed tables, the probe's joins
    // must read the corpus in place — any Exchange (shuffle OR broadcast)
    // on a corpus-side join input means the layout bought nothing.
    // Broadcast is disabled so the tiny sf0.001 store can't satisfy the
    // assert the easy way a 100 TB corpus never could.
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // direct operator call (materialize = false): the catalog query
      // checkpoints its result, which would hide the probe plan
      import org.apache.spark.sql.functions.col
      val prefix = SparkEntry.stageLshCorpus(spark, "/root/testdata/sf0.001")
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val df = graft.operators.Dedup.minhashLshProbeStored(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        prefix, threshold = 0.7)
      val p = df.queryExecution.sparkPlan
      val joins = p.collect {
        case j if j.nodeName.contains("Join") => j
      }
      // a join input that reads ONLY the stored corpus tables (no
      // documents.parquet anywhere beneath) is a corpus side
      val corpusSides = joins.flatMap(_.children).filter { c =>
        val s = c.treeString
        s.contains("graft_lsh_") && !s.contains("documents.parquet")
      }
      assert(corpusSides.size >= 2,
        s"expected the candidate + verification joins to stream the stored corpus:\n${p.treeString}")
      corpusSides.foreach { c =>
        assert(!c.treeString.contains("Exchange"),
          s"corpus side of a probe join takes an exchange:\n${c.treeString}")
      }
      // and the bucketed layout is what the scan actually uses
      assert(p.treeString.contains("Bucketed: true"),
        s"stored corpus scan is not a bucketed read:\n${p.treeString}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
      spark.catalog.clearCache() // release the probe-side kernel base
    }
  }

  test("q188 stored IVF probe prunes to the probed lists' partitions") {
    // nProbe = 2 of 16 lists: the scan must carry a list_id partition
    // filter and select at most 2 of the 16 list directories — bytes read
    // scale with probed lists, not corpus size
    import org.apache.spark.sql.functions.col
    val (path, centroids) = SparkEntry.stageIvfLists(spark, "/root/testdata/sf0.001")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val df = graft.operators.Similarity.ivfTopKStored(
      path, centroids, queries, "qid", "qvec", k = 3, nProbe = 2)
    // sparkPlan, not executedPlan: AQE wraps stages and hides the scan
    // from a pre-execution collect
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("graft_ivf_")) => s
    }
    assert(scans.nonEmpty, "stored-lists scan not found in the probe plan")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "list_id")),
        s"no list_id partition filter on the stored scan:\n$s")
      // the literal IN prunes statically; the broadcast join ALSO attaches
      // a DynamicPruningSubquery (runtime-only — exclude it from the
      // static listing, it cannot be evaluated before execution)
      val staticFilters = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery]))
      val selected = s.relation.location.listFiles(staticFilters, s.dataFilters)
        .map(_.values).distinct.size
      assert(selected <= 4, // 2 queries × nProbe 2: at most 4 distinct lists
        s"pruning selected $selected of 16 list partitions")
    }
  }

  test("q207 IVF+PQ probe is a pruned, codes-only scan") {
    // the composed invariant: q188's PartitionFilters (bytes read scale
    // with probed lists) AND q196's ReadSchema (only id + codes — the
    // vectors never ride the probe)
    import org.apache.spark.sql.functions.col
    val (path, cents, cbs) = SparkEntry.stageIvfPq(spark, "/root/testdata/sf0.001")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val df = graft.operators.Similarity.ivfPqTopK(
      path, cents, cbs, queries, "qid", "qvec", k = 3, nProbe = 2)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("graft_ivfpq_")) => s
    }
    assert(scans.nonEmpty, "stored-codes scan not found in the probe plan")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "list_id")),
        s"no list_id partition filter on the stored scan:\n$s")
      val staticFilters = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery]))
      val selected = s.relation.location.listFiles(staticFilters, s.dataFilters)
        .map(_.values).distinct.size
      assert(selected <= 4, // 2 queries × nProbe 2: at most 4 distinct lists
        s"pruning selected $selected of 8 list partitions")
      // codes-only: the data schema read from the files is (id, codes)
      assert(s.requiredSchema.fieldNames.toSet == Set("id", "codes"),
        s"probe reads more than (id, codes): ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("q206 stored SemDeDup probe prunes to the batch's clusters") {
    // a 2-vector batch probes at most 2 of the 8 cluster directories: the
    // stored scan must carry a cluster partition filter and the static
    // listing must select only the probed clusters — bytes read scale
    // with the batch's cluster spread, not corpus size
    import org.apache.spark.sql.functions.col
    val (path, seeds) = SparkEntry.stageSemDedupClusters(spark, "/root/testdata/sf0.001")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val batch = emb.filter(col("vec_id").isin(11, 13))
    val df = graft.operators.Similarity.semDedupProbeStored(
      batch, "vec_id", "embedding", path, seeds, tau = 0.42, clusterDims = 8)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("graft_sdd_")) => s
    }
    assert(scans.nonEmpty, "stored-clusters scan not found in the probe plan")
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "cluster")),
        s"no cluster partition filter on the stored scan:\n$s")
      val staticFilters = s.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery]))
      val selected = s.relation.location.listFiles(staticFilters, s.dataFilters)
        .map(_.values).distinct.size
      assert(selected <= 2, // 2 batch vectors: at most 2 distinct clusters
        s"pruning selected $selected of the cluster partitions")
    }
  }

  test("AQE splits a skewed shuffle join at runtime (skew=true in final plan)") {
    // the runtime complement to ScaleOps.saltedJoin's manual lever: on a
    // cluster, spark.sql.adaptive.skewJoin must split a hot partition
    // without code changes. Thresholds are scaled down so the fixture's
    // ~20 MB hot key trips the same machinery a 100 TB hot key would.
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // 90% of 300k left rows share key 0 (~20 MB with payload); right is
      // 1k distinct keys, too big to broadcast with broadcast disabled
      val left = spark.range(0, 300000)
        .select(when(col("id") % 10 =!= 9, lit(0L)).otherwise(col("id") % 1000).as("k"),
          lpad(col("id").cast("string"), 64, "x").as("payload"))
      val right = spark.range(0, 1000)
        .select(col("id").as("k"), col("id").cast("string").as("name"))
      // global aggregate, NOT groupBy(k): a downstream operator requiring
      // hashpartitioning(k) would forbid the split (AQE must preserve
      // required distributions); max(payload) keeps the wide column from
      // being pruned so the hot partition's shuffle bytes trip the
      // threshold
      val agg = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("w"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("semDedup: compiled kernels assign and score; the pair join is keyed") {
    val p = plan("q189_semdedup")
    assert(p.contains("nearest_centroid"), s"assignment must use the compiled kernel:\n$p")
    assert(p.contains("cosine_similarity"), s"scoring must use the compiled kernel:\n$p")
    // within-cluster pairing is an equi-join on the cluster key — never a
    // corpus-quadratic nested loop
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pair generation must be a keyed join:\n$p")
    assert(p.contains("partial"), s"per-id aggregation must map-side combine:\n$p")
  }

  test("hybrid RRF: fusion joins are keyed full-outer merges of top-k sets") {
    val p = plan("q190_hybrid_rrf")
    assert(p.contains("FullOuter"), s"rrf fusion must full-outer join the rankings:\n$p")
    assert(!p.contains("CartesianProduct"), s"fusion must never go quadratic:\n$p")
  }

  test("dsir: bucket log-ratios broadcast back; aggregations are partial") {
    val p = plan("q191_dsir_weights")
    assert(p.contains("BroadcastExchange"), s"the B-row llr table must broadcast:\n$p")
    assert(p.contains("partial"), s"histograms must map-side combine:\n$p")
    assert(!p.contains("ArrayTransform") && !p.contains("ArrayAggregate"),
      s"no interpreted higher-order functions:\n$p")
  }

  test("duplicate spans: match join is an equi-join; islands window is keyed") {
    val p = plan("q192_duplicate_spans")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"shingle matching must join on the shingle key:\n$p")
    assert(p.contains("shingle_strings"), s"position stamping must use the kernel:\n$p")
  }

  test("pq/adc: corpus rows meet only the broadcast LUT; encode is kernel-compiled") {
    val p = plan("q194_pq_adc")
    assert(p.contains("nearest_centroid"), s"encoding must use the compiled kernel:\n$p")
    assert(p.contains("BroadcastExchange"), s"query LUTs must broadcast:\n$p")
    // the ADC projection is lookups into the broadcast LUT — the corpus
    // side shuffles only for the per-query rank window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"corpus must not shuffle before the rank window:\n$p")
  }

  test("dsir selection compiles to TakeOrderedAndProject — no global sort") {
    val p = plan("q197_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      s"gumbel top-k must be a bounded-heap take, not a full sort:\n$p")
  }

  test("q196 stored-PQ probe scans codes only — the embedding never loads") {
    val p = plan("q196_pq_stored")
    // the corpus-side scan is the stored codes table; its ReadSchema must
    // carry (id, codes) and NO embedding column — the 32× scan-size win
    // is the whole point of the stored layout
    val codesScan = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("graft_pq_")).mkString("\n")
    assert(codesScan.nonEmpty, s"expected a scan of the stored codes table:\n$p")
    assert(codesScan.contains("codes") && !codesScan.contains("embedding"),
      s"stored-codes scan must not read vectors:\n$codesScan")
  }

  test("source scorecard is one keyed aggregation with map-side combine") {
    val p = plan("q199_source_scorecard")
    assert(p.contains("partial"), s"scorecard must partial-aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"scorecard needs no join at all:\n$p")
  }

  test("word dropout: md5 keep-decision is a plain Filter; no join blow-up") {
    val p = plan("q204_word_dropout")
    // the keep-decision evaluates as a stateless Filter over the exploded
    // token stream (it sits directly above the generator in the plan, so
    // dropped tokens never reach the reassembly exchange)
    val filterLines = p.linesIterator.filter(l =>
      l.contains("Filter") && l.contains("md5")).toSeq
    assert(filterLines.nonEmpty, s"expected an md5 keep-filter node:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"dropout must stay linear:\n$p")
  }

  test("global windows appear ONLY over bounded-by-construction tables — the lint") {
    // A WindowExec without partitioning funnels its whole input through one
    // task — the canonical 100 TB stall. The test log carries ~190 benign
    // WindowExec warnings (bounded spines, post-limit top-k), which would
    // bury a NEW data-sized one; this pins the exact set of declared
    // queries allowed to plan one, with the boundedness argument per entry.
    // A new global window ANYWHERE (or an extra one in an allowlisted
    // query) fails until it is justified here or re-planned.
    val allowed = Map(
      // per-hour bucket table (z-score + rolling stats over hours)
      "q107_rate_anomaly" -> 2,
      // per-day adoption spine (calendar-sized)
      "q119_adoption_curve" -> 1,
      // per-day rolling-median series (calendar-sized)
      "q122_rolling_median" -> 1,
      // suffix-min over the ≤`buckets` (1024) CDF cell spine; the
      // data-sized ref-CDF cumsum runs distributed (ScaleOps)
      "q163_quantile_norm" -> 1,
      // exclusive cumsum over the id-range/blockSize block table
      "q47_pack_sequences" -> 1,
      // same packing block table inside the composed pipeline
      "q52_corpus_pipeline" -> 1,
      // rank over the top-`topK`-limited term table (post-limit)
      "q95_zipf_fit" -> 1,
      // same block-table cumsum as q47 (packing stats)
      "q96_packing_stats" -> 1,
      // rank over each 20-row post-limit term ranking (two rankings) —
      // the post-limit shape is machine-checked by the dedicated q234
      // window-above-TakeOrdered test below
      "q234_rbo" -> 2,
      // CUSUM prefix sum + day index over the per-day bucket spine
      // (calendar-sized, the q119/q122 class)
      "q254_cusum" -> 2,
      // EWMA scaled prefix sum + first_value (one WindowExec) and the
      // lag pair (second) over the zero-filled day spine —
      // calendar-sized, the q119/q122 class
      "q322_ewma_backtest" -> 2,
      // Holm step-down over the 5-row runs-test battery: the battery
      // count, the ascending rank, and the running max each plan one
      // node — all over a TEST-bounded table (the q95 class)
      "q329_p_adjust" -> 3,
      // Benjamini-Yekutieli over the same 5-row battery: the count, the
      // descending rank, the harmonic-penalty sum Σ1/rank, and the
      // running min — all TEST-bounded (the q329/q95 class)
      "q349_p_adjust_by" -> 4)
    // Sub-job lint: queries whose CONSTRUCTION executes jobs (cutpoint
    // collects, Lloyd steps, stored-layout writes) evade the returned-plan
    // inspection above — round 12 shipped five quantile-cut operators with
    // an unkeyed data-sized window exactly there. A QueryExecutionListener
    // captures every executed plan during construction; the allowlist
    // below pins the queries allowed to execute one, with the boundedness
    // argument per entry (currently none — eager sub-jobs route rank work
    // through ScaleOps' distributed cumsum).
    val allowedEager = Map.empty[String, Int]
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def unkeyedWindows(p: SparkPlan): Int = {
      var hits = 0
      def go(n: SparkPlan): Unit = {
        n match {
          case w: WindowExec if w.partitionSpec.isEmpty => hits += 1
          case g: WindowGroupLimitExec if g.partitionSpec.isEmpty => hits += 1
          case a: AdaptiveSparkPlanExec => go(a.executedPlan)
          case q: QueryStageExec => go(q.plan)
          case _ =>
        }
        n.children.foreach(go)
        n.subqueries.foreach(go)
      }
      go(p)
      hits
    }
    val eagerHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        eagerHits.addAndGet(unkeyedWindows(qe.executedPlan))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val (found, foundEager) =
      try {
        val perQuery = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          eagerHits.set(0)
          // sparkPlan (pre-AQE): WindowExec nodes are visible without running
          val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.sparkPlan
          // async listener delivery: drain before attributing to `name`
          org.apache.spark.ListenerBusHatch.drain(spark.sparkContext)
          (name, plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
            case g: WindowGroupLimitExec if g.partitionSpec.isEmpty => g
          }.size, eagerHits.get)
        }
        (perQuery.collect { case (n, c, _) if c > 0 => n -> c }.toMap,
          perQuery.collect { case (n, _, e) if e > 0 => n -> e }.toMap)
      } finally spark.listenerManager.unregister(listener)
    assert(found == allowed,
      s"global-window set changed.\n  new/changed: ${(found.toSet -- allowed.toSet).toSeq.sorted}" +
        s"\n  missing:     ${(allowed.toSet -- found.toSet).toSeq.sorted}\n" +
        "Every entry needs a boundedness argument in this allowlist.")
    assert(foundEager == allowedEager,
      s"eager sub-job global-window set changed.\n" +
        s"  new/changed: ${(foundEager.toSet -- allowedEager.toSet).toSeq.sorted}\n" +
        s"  missing:     ${(allowedEager.toSet -- foundEager.toSet).toSeq.sorted}\n" +
        "A query CONSTRUCTION executed an unkeyed WindowExec — route the " +
        "rank/cutpoint work through ScaleOps.rankCutpoints/" +
        "withExclusiveRunningSums, or justify boundedness here.")
  }

  test("q234 ranking windows run ABOVE the top-20 limit, never on the vocab") {
    // each row_number window's immediate child must be the
    // TakeOrderedAndProject that cuts the data-sized term-count table to
    // 20 rows — the window input is the LIMITED table by plan shape, not
    // by allowlist trust
    val p = SparkEntry.queries("q234_rbo")(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 2, s"expected the two ranking windows:\n$p")
    windows.foreach { w =>
      assert(w.child.isInstanceOf[
          org.apache.spark.sql.execution.TakeOrderedAndProjectExec],
        s"window must sit directly above the top-k limit:\n${w.treeString}")
      assert(w.child.asInstanceOf[
          org.apache.spark.sql.execution.TakeOrderedAndProjectExec].limit == 20)
    }
  }

  test("writePartitioned: pruned read lists only the filtered directory") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("event_type").isNotNull)
    graft.ops.LayoutOps.writePartitioned(src, s"$tmp/by_type",
      Seq("event_type"))
    val back = spark.read.parquet(s"$tmp/by_type")
      .filter(col("event_type") === "click")
    val scan = back.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec"))
    assert(scan.partitionFilters.nonEmpty,
      s"partition filter must prune directories:\n${scan.treeString}")
    // the pruned read returns exactly the source slice
    val expected = src.filter(col("event_type") === "click").count()
    assert(back.count() == expected)
    // every value gets its own directory
    val dirs = new java.io.File(s"$tmp/by_type").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=click")), s"dirs: $dirs")
    // cardinality guard fires on near-unique partition columns
    intercept[IllegalArgumentException] {
      graft.ops.LayoutOps.writePartitioned(src, s"$tmp/bad",
        Seq("event_id"), maxPartitions = 100)
    }
  }

  test("random projection is a pure scan projection — no exchange, no UDF") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = graft.operators.Similarity
      .randomProjection(emb, "vec_id", "embedding", inDims = 64, outDims = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("bpe encode composes the merge chain without exploding the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = graft.operators.CorpusStats
      .bpeEncode(docs, "text", Seq("e" -> "r", "i" -> "n"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Generate"), s"no explode in the encode path:\n$p")
    assert(!p.contains("Exchange"), s"encode is scan-local:\n$p")
  }

  test("tfidf keywords: heap-capped per-doc top-k; df join is NOT broadcast") {
    val p = plan("q218_tfidf_keywords")
    // the k-bounded heap aggregate (TypedImperativeAggregate) plans as
    // ObjectHashAggregate with a partial stage
    assert(p.contains("ObjectHashAggregate"), s"expected heap top-k:\n$p")
    // the full-vocabulary df table must stay a planner decision (no
    // broadcast hint) — at sf0.001 AQE may still choose broadcast, so
    // assert the absence of the HINT by checking the analyzed plan
    val analyzed = SparkEntry.queries("q218_tfidf_keywords")(
      spark, "/root/testdata/sf0.001").queryExecution.analyzed.toString
    val hinted = analyzed.linesIterator.count(_.contains("ResolvedHint"))
    assert(hinted <= 1, s"only the scalar stats row may carry a hint:\n$analyzed")
  }

  test("targetEncodeLoo: per-category aggregate join carries no broadcast hint") {
    // the operator targets HIGH-cardinality categoricals, where the
    // per-category aggregate is unbounded (10^7-10^8 categories at
    // 100 TB) — a forced broadcast would OOM the driver. The plan must
    // leave the join strategy to the planner/AQE: zero ResolvedHint in
    // the analyzed plan even when every row is its own category.
    val wide = spark.range(5000).selectExpr(
      "id", "cast(id as string) AS cat", "cast(id % 2 as long) AS y")
    val analyzed = graft.operators.LinearModel
      .targetEncodeLoo(wide, "id", "cat", "y")
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"high-cardinality encode must not force a broadcast:\n$analyzed")
  }

  test("association: corpus aggregates once (exchange reuse); marginals broadcast") {
    // the pre-AQE plan repeats the cells subtree under ma/mb/totals; at
    // execution AQE's exchange reuse dedupes the identical corpus-sized
    // exchanges, so the corpus scans+aggregates ONCE and every other
    // exchange moves only the cell-bounded table
    val df = SparkEntry.queries("q223_lang_source_assoc")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"the corpus contingency exchange must be computed once and reused:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"marginals/totals must broadcast:\n$p")
  }

  test("benford: scan projection into a 9-group aggregate; spine broadcasts") {
    val p = plan("q227_benford")
    assert(p.contains("BroadcastExchange"), s"spine/totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // digit extraction is a projection in the scan stage — pushed filter
    // on the value column reaches parquet
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice)"),
      s"the usable-value filter must push down:\n$p")
    // the χ² total rides the same one-row aggregate as the digit map — the
    // scan lineage must appear exactly once (r10 VERDICT: the old shape
    // re-evaluated the per-digit subtree for the total)
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans == 1, s"benford must read the corpus exactly once, got $scans:\n$p")
  }

  test("associationMatrix: ONE parquet scan for a 4-column matrix") {
    // the all-pairs leakage scan explodes every pair's (pid, va, vb) struct
    // in one projection — 6 pairs over 4 columns must still read the corpus
    // once (r10 VERDICT: the old shape planned one scan per pair). After
    // execution AQE's exchange reuse collapses the repeated cells subtree
    // under the marginal/total derivations to ReusedExchange nodes.
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("len_bucket", floor(col("n_chars") / 500).cast("long"))
      .withColumn("id_mod", (col("doc_id") % 7).cast("long"))
    val df = graft.profile.Association.associationMatrix(
      docs, Seq("lang", "source", "len_bucket", "id_mod"))
    df.collect()
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" section,
    // which still shows one scan per subtree — count the FINAL plan only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = p.sliding("Scan parquet".length).count(_ == "Scan parquet")
    assert(scans == 1, s"matrix must read the corpus exactly once, got $scans:\n$p")
    assert(p.contains("ReusedExchange"),
      s"the cells exchange must be computed once and reused:\n$p")
  }

  test("resampling ops shuffle replicate aggregates only; OOV vocab broadcasts") {
    // permutation test / bootstrap: the corpus is exploded INTO a partial
    // aggregation — the exchanges carry 2·nPerms (resp. reps) aggregate
    // rows, never data; the md5 assignment is a plain projection
    for (q <- Seq("q242_permutation_test", "q243_bootstrap_ci")) {
      val p = plan(q)
      assert(p.contains("Generate explode"), s"$q: replicate explode missing:\n$p")
      assert(p.contains("partial"), s"$q: aggregation must map-side combine:\n$p")
      val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges <= 4,
        s"$q: expected only replicate-sized exchanges, got $exchanges:\n$p")
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
        s"$q: md5 resampling must stay codegen'd:\n$p")
    }
    // OOV: the bounded vocab joins broadcast — the corpus tokens never
    // shuffle for the membership probe
    val p = plan("q241_oov_rate")
    assert(p.contains("BroadcastHashJoin"),
      s"vocab membership must be a broadcast join:\n$p")
  }

  test("novelty curve: no global single-partition window at any batch count") {
    // the cumulative sum rides the deterministic-bucket cumsum — its only
    // windows are bucket-keyed (the blanket global-window lint also covers
    // this; pinned here because the curve's input is data-sized at 100 TB)
    val sp = SparkEntry.queries("q224_novelty_curve")(
      spark, "/root/testdata/sf0.001").queryExecution.sparkPlan
    val global = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, s"data-sized global window:\n$sp")
    val p = plan("q224_novelty_curve")
    assert(p.contains("HashAggregate"),
      s"fingerprint/batch aggregations must partial-combine:\n$p")
  }

  test("no declared query plans a CartesianProduct — the blanket invariant") {
    // every query's physical plan at sf0.001; broadcast nested loops over
    // provably tiny sides are allowed (and documented per query), a true
    // cartesian is never acceptable at any scale
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }
}

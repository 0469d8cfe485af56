package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Search}

class SearchSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple"),
    (3L, "cherry date elderberry fig"),
    (4L, "banana banana banana banana")).toDF("doc_id", "text")

  test("bm25: only matching docs score, formula matches hand computation") {
    val q = Seq((0L, "apple banana")).toDF("query_id", "qtext")
    val out = Search.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", k = 10)
      .orderBy("rank").collect()
    // doc 3 shares no term with the query → absent
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L, 4L) - 3L)
    // hand computation for doc 2 (tf=1 for 'apple', dl=1):
    // N=4, avgdl=(3+1+4+4)/4=3.0, df(apple)=2
    val k1 = 1.2; val b = 0.75
    val idfApple = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    val expected2 = idfApple * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 1.0 / 3.0))
    val got2 = out.find(_.getAs[Long]("doc_id") == 2L).get.getAs[Double]("score")
    assert(math.abs(got2 - expected2) < 1e-9, s"got $got2, expected $expected2")
    // doc 1 matches both terms → outranks single-term docs
    assert(out.head.getAs[Long]("doc_id") == 1L)
    // ranks are 1..n in score order
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
  }

  test("bm25: repeated query terms count once; k caps each query") {
    val q = Seq((0L, "apple"), (1L, "apple apple APPLE")).toDF("query_id", "qtext")
    val out = Search.bm25TopK(docs, "doc_id", "text", q, "query_id", "qtext", k = 1)
    val rows = out.collect()
    assert(rows.count(_.getAs[Long]("query_id") == 0L) == 1) // k = 1
    val s0 = rows.filter(_.getAs[Long]("query_id") == 0L).map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet
    val s1 = rows.filter(_.getAs[Long]("query_id") == 1L).map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet
    assert(s0 == s1) // distinct terms → same scores
  }

  test("top ngrams: occurrence counts, doc freq, deterministic tiebreak") {
    val corpus = Seq(
      (1L, "a b c a b c x"), // 'a b c' twice here
      (2L, "a b c z"),
      (3L, "p q r")).toDF("doc_id", "text")
    val top = CorpusStats.topNgrams(corpus, "doc_id", "text", n = 3, k = 3).collect()
    assert(top.head.getAs[String]("ngram") == "a b c")
    assert(top.head.getAs[Long]("total_count") == 3L)
    assert(top.head.getAs[Long]("doc_freq") == 2L)
    // remaining grams all have count 1 → ordered by ngram string
    val rest = top.tail.map(_.getAs[String]("ngram")).toSeq
    assert(rest == rest.sorted)
  }

  test("shingle df histogram counts distinct shingles per doc frequency") {
    val corpus = Seq(
      (1L, "a b c d"),  // shingles: "a b c","b c d"
      (2L, "a b c e"),  // "a b c","b c e"
      (3L, "x y z")).toDF("doc_id", "text") // "x y z"
    val h = CorpusStats.shingleDfHistogram(corpus, "text", shingleSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // df=1: "b c d","b c e","x y z"; df=2: "a b c"
    assert(h == Map(1L -> 3L, 2L -> 1L))
  }

  test("unigram log loss: rare-token docs score higher, math checks out") {
    val corpus = Seq(
      (1L, "common common common common"), // all mass on the frequent token
      (2L, "common rare")).toDF("doc_id", "text")
    val rows = CorpusStats.unigramLogLoss(corpus, "doc_id", "text")
      .orderBy("id").collect()
    // p(common) = 5/6, p(rare) = 1/6
    val l1 = -math.log(5.0 / 6.0)
    val l2 = (-math.log(5.0 / 6.0) - math.log(1.0 / 6.0)) / 2.0
    assert(math.abs(rows(0).getAs[Double]("log_loss") - l1) < 1e-9)
    assert(math.abs(rows(1).getAs[Double]("log_loss") - l2) < 1e-9)
    assert(rows(1).getAs[Double]("log_loss") > rows(0).getAs[Double]("log_loss"))
    assert(math.abs(rows(0).getAs[Double]("perplexity") - math.exp(l1)) < 1e-9)
    assert(rows(0).getAs[Long]("n_tokens") == 4L)
  }

  test("top ngrams run on the real documents table") {
    val real = spark.read.parquet(sf("documents"))
    val top = CorpusStats.topNgrams(real, "doc_id", "text", n = 3, k = 10).collect()
    assert(top.length == 10)
    assert(top.forall(_.getAs[Long]("total_count") >= top.last.getAs[Long]("total_count")))
  }

  test("zipf fit recovers an exact power law and its R²") {
    // counts c = round(1000 / rank): a synthetic slope ≈ -1 corpus
    val rows = (1 to 50).flatMap { r =>
      Seq.fill(math.max(1, 1000 / r))(s"term$r")
    }
    val corpus = Seq((1L, rows.mkString(" "))).toDF("doc_id", "text")
    val fit = CorpusStats.zipfFit(corpus, "text", topK = 50).head()
    assert(fit.getAs[Long]("n_terms") == 50L)
    val slope = fit.getAs[Double]("slope")
    val r2 = fit.getAs[Double]("r2")
    assert(slope < -0.9 && slope > -1.1, s"slope $slope not near -1")
    assert(r2 > 0.99, s"r2 $r2 not near 1 for an exact power law")
    // topK caps the fitted vocabulary
    assert(CorpusStats.zipfFit(corpus, "text", topK = 10)
      .head().getAs[Long]("n_terms") == 10L)
  }

  test("novelty score: unique-shingle share, short docs omitted") {
    val corpus = Seq(
      (1L, "a b c d"), // shingles: "a b c" (shared), "b c d" (unique)
      (2L, "a b c e"), // shingles: "a b c" (shared), "b c e" (unique)
      (3L, "x y z"), // one unique shingle
      (4L, "too short")).toDF("doc_id", "text")
    val rows = CorpusStats.noveltyScore(corpus, "doc_id", "text")
      .orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // doc 4 dropped
    assert(rows(0).getAs[Long]("n_shingles") == 2L)
    assert(rows(0).getAs[Long]("n_unique") == 1L)
    assert(rows(0).getAs[Double]("novelty") == 0.5)
    assert(rows(1).getAs[Double]("novelty") == 0.5)
    assert(rows(2).getAs[Double]("novelty") == 1.0)
  }

  test("inverted index: df/tf counts, sorted postings, df bounds") {
    val out = Search.invertedIndex(docs, "doc_id", "text", minDf = 2)
      .orderBy("term").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("apple", "banana"))
    val apple = out(0)
    assert(apple.getAs[Long]("df") == 2L) // docs 1 and 2
    assert(apple.getAs[Long]("tf_total") == 3L) // 2 + 1 occurrences
    assert(apple.getAs[String]("postings") == "1,2")
    val banana = out(1)
    assert(banana.getAs[Long]("df") == 2L && banana.getAs[Long]("tf_total") == 5L)
    assert(banana.getAs[String]("postings") == "1,4")
    // maxDf drops the common terms, keeping the singleton vocabulary
    val rare = Search.invertedIndex(docs, "doc_id", "text", maxDf = 1)
      .select("term").collect().map(_.getString(0)).toSet
    assert(rare == Set("cherry", "date", "elderberry", "fig"))
    intercept[IllegalArgumentException] {
      Search.invertedIndex(docs, "doc_id", "text", minDf = 0)
    }
  }

  test("inverted index postings cover the corpus exactly once per (term, doc)") {
    val real = spark.read.parquet(sf("documents"))
    val idx = Search.invertedIndex(real, "doc_id", "text")
    // Σ df over the index = number of distinct (term, doc) pairs
    val sumDf = idx.agg(sum("df")).head().getLong(0)
    val distinctPairs = real
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("term"))
      .count()
    assert(sumDf == distinctPairs)
  }

  test("trendingTerms: smoothed log ratio ranks rising terms first") {
    val a = Seq((1L, "alpha alpha beta"), (2L, "alpha beta gamma")).toDF("id", "text")
    val b = Seq((3L, "beta delta delta"), (4L, "delta delta gamma")).toDF("id", "text")
    val out = CorpusStats.trendingTerms(a, b, "text", k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byTerm = out.toMap
    // delta: absent in a (0) -> 4 in b: the top riser; alpha: 3 -> 0: the top faller
    assert(out.head._1 == "delta")
    assert(byTerm("delta")._1 == 0L && byTerm("delta")._2 == 4L)
    assert(out.last._1 == "alpha" && byTerm("alpha")._3 < 0)
    // hand-check delta score: ln((5/7)/(1/7)) = ln 5
    assert(math.abs(byTerm("delta")._3 - math.log(5.0)) < 1e-5)
  }


  test("categoricalDiversity: entropy/gini extremes behave") {
    val df = (Seq.fill(4)(("uniform", "a")) ++ Seq.fill(4)(("uniform", "b")) ++
      Seq.fill(8)(("mono", "x"))).toDF("src", "lang")
    val out = CorpusStats.categoricalDiversity(df, "src", "lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val (n1, k1, h1, g1) = out("uniform")
    assert(n1 == 8L && k1 == 2L)
    assert(math.abs(h1 - math.log(2.0)) < 1e-12) // max entropy for 2 cats
    assert(math.abs(g1 - 0.5) < 1e-12)
    val (_, k2, h2, g2) = out("mono")
    assert(k2 == 1L && h2 == 0.0 && g2 == 0.0)   // no diversity
  }

  test("corpusOverlap: identical corpora give jaccard 1, disjoint give 0") {
    val a = Seq((1L, "the quick brown fox jumps high")).toDF("id", "text")
    val b = Seq((2L, "the quick brown fox jumps high")).toDF("id", "text")
    val same = CorpusStats.corpusOverlap(a, b, "text").collect().head
    assert(same.getLong(2) == same.getLong(3)) // intersect == union
    assert(same.getDouble(4) == 1.0)
    val c = Seq((3L, "completely different words entirely here now")).toDF("id", "text")
    val disj = CorpusStats.corpusOverlap(a, c, "text").collect().head
    assert(disj.getLong(2) == 0L && disj.getDouble(4) == 0.0)
  }

  test("winnowedFingerprints: signature is a subset of the k-gram hashes and smaller") {
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq((1L, text)).toDF("id", "text")
    val fps = CorpusStats.winnowedFingerprints(df, "id", "text", k = 3, window = 4)
      .collect().map(_.getString(1)).toSet
    // 12 tokens -> 10 3-grams -> 7 complete windows; every fp is some k-gram's md5
    val toks = text.split(" ")
    val allHashes = toks.sliding(3).map { g =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toSet
    assert(fps.nonEmpty && fps.size < allHashes.size)
    assert(fps.subsetOf(allHashes))
  }

  test("winnowing guarantee: docs sharing >= window+k-1 consecutive tokens share a fp") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = window+k-1
    val df = Seq(
      (1L, s"unrelated prefix words here $shared"),
      (2L, s"$shared and a completely different tail of text")
    ).toDF("id", "text")
    val pairs = CorpusStats.winnowCandidates(df, "id", "text", k = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("winnowing: documents shorter than window+k-1 tokens emit no fingerprints") {
    val df = Seq((1L, "only five little words here"), (2L, "tiny")).toDF("id", "text")
    assert(CorpusStats.winnowedFingerprints(df, "id", "text", k = 3, window = 4).isEmpty)
  }

  test("winnowCandidates: unrelated docs share nothing; minShared filters") {
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "qq ww rr tt yy uu ii oo")
    ).toDF("id", "text")
    assert(CorpusStats.winnowCandidates(df, "id", "text", k = 3, window = 4).isEmpty)
  }

  test("tokenizerFertility: subwords per word per group; zero-word group is NULL") {
    val df = Seq(
      ("en", "hello world42 foo"),   // 3 words; subwords: hello, world, 42, foo = 4
      ("en", "plain words here"),    // 3 words, 3 subwords
      ("zz", "!!! ...")              // 2 \s+-tokens but 0 words? tokens are "!!!","..." -> words=2, subwords=0
    ).toDF("lang", "text")
    val out = CorpusStats.tokenizerFertility(df, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out("en") == ((2L, 6L, 7L, Some(BigDecimal(7.0 / 6.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(out("zz")._3 == 0L) // punctuation-only: no letter/number runs
  }

  test("charNgrams kernel: ASCII strip-then-lower normalization, ordered multiset") {
    val df = Seq((1L, "Héllo, World42!")).toDF("id", "text")
    val grams = df.select(explode(
      graft.functions.kernels.TextKernelFunctions.charNgrams(col("text"), 3)).as("g"))
      .collect().map(_.getString(0)).toSeq
    // normalized text: "h llo world" (é, comma, digits, ! are separators)
    assert(grams == Seq("h l", " ll", "llo", "lo ", "o w", " wo", "wor", "orl", "rld"))
    // below n normalized chars -> empty
    val short = Seq((1L, "a!b")).toDF("id", "text") // normalizes to "a b": 1 gram
    assert(short.select(explode(
      graft.functions.kernels.TextKernelFunctions.charNgrams(col("text"), 3)).as("g"))
      .collect().map(_.getString(0)).toSeq == Seq("a b"))
    assert(Seq((1L, "77!!")).toDF("id", "text").select(explode(
      graft.functions.kernels.TextKernelFunctions.charNgrams(col("text"), 3)).as("g"))
      .isEmpty) // normalizes to "" — no grams
  }

  test("charLmCounts: occurrence counts over the reference multiset") {
    val ref = Seq((1L, "abab"), (2L, "abab")).toDF("id", "text")
    val lm = CorpusStats.charLmCounts(ref, "text", n = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lm == Map("aba" -> 2L, "bab" -> 2L))
  }

  test("charLmScore: add-1 smoothed conditional nll matches hand computation") {
    val ref = Seq((1L, "aaaa")).toDF("id", "text") // trigram aaa x2
    val lm = CorpusStats.charLmCounts(ref, "text", n = 3)
    val docs = Seq((1L, "aaab"), (2L, "x!")).toDF("id", "text")
    val out = CorpusStats.charLmScore(docs, "id", "text", lm, n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // doc 1: grams aaa, aab. P(aaa)=(2+1)/(2+27), P(aab)=(0+1)/(2+27)
    val expected = -(math.log(3.0 / 29.0) + math.log(1.0 / 29.0)) / 2.0
    assert(out(1L)._1 == 2L && math.abs(out(1L)._2.get - expected) < 1e-12)
    // doc 2 normalizes to "x" — too short: zero grams, NULL nll (not the
    // unseen-gram smoothed value)
    assert(out(2L) == ((0L, None)))
  }

  test("rrfFuse: both-source docs outrank single-source; null rank where missed") {
    // query 0: doc 10 is rank 1 in both sources -> rrf 2/61;
    // doc 11 only in a (rank 2), doc 12 only in b (rank 2)
    val a = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 10L, 1), (0L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq("a" -> a, "b" -> b), k = 10)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L, 12L))
    val top = out.head
    // rrf_score is rounded to 6 dp on output
    assert(math.abs(top.getAs[Double]("rrf_score") - 2.0 / 61.0) < 5e-7)
    // doc 11 and 12 tie on score (1/62) -> doc_id ascending breaks it
    assert(out(1).getAs[Double]("rrf_score") == out(2).getAs[Double]("rrf_score"))
    assert(out(1).isNullAt(out(1).fieldIndex("rank_b")))
    assert(out(2).isNullAt(out(2).fieldIndex("rank_a")))
  }

  test("rrfFuse: k caps the fused list per query") {
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (1L, 3L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 2L, 1), (0L, 3L, 2), (1L, 3L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq("a" -> a, "b" -> b), k = 1).collect()
    assert(out.length == 2 && out.forall(_.getAs[Int]("rank") == 1))
    // query 0's winner is doc 2: 1/62 + 1/61 > 1/61 (doc 1) and > 1/62 (doc 3)
    assert(out.find(_.getLong(0) == 0L).get.getAs[Long]("doc_id") == 2L)
  }

  test("rrfFuse rejects duplicate source names, case-insensitively") {
    // Spark resolves columns case-insensitively by default, so rank_BM25
    // and rank_bm25 would be ambiguous downstream — the guard must catch
    // both exact and case-folded duplicates up front
    val a = Seq((0L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 2L, 1)).toDF("query_id", "doc_id", "rank")
    assertThrows[IllegalArgumentException](
      Search.rrfFuse(Seq("x" -> a, "x" -> b), k = 1))
    assertThrows[IllegalArgumentException](
      Search.rrfFuse(Seq("BM25" -> a, "bm25" -> b), k = 1))
  }

  test("sourceScorecard: dup rate, token volume and lang share per source") {
    val docs = Seq(
      (1L, "a b c", "s1", "en"),
      (2L, "a b c", "s1", "en"),   // exact dup of 1 (normalized)
      (3L, "A  B C ", "s1", "de"), // normalizes to the same fingerprint
      (4L, "x y", "s2", "zh")).toDF("doc_id", "text", "source", "lang")
    val out = graft.operators.CorpusStats.sourceScorecard(
        docs, "text", "source", "lang", "en")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") == 3 && s1.getAs[Long]("n_distinct") == 1)
    assert(math.abs(s1.getAs[Double]("dup_rate") - 0.6667) < 1e-9)
    assert(s1.getAs[Long]("total_tokens") == 9)
    assert(math.abs(s1.getAs[Double]("target_lang_share") - 0.6667) < 1e-9)
    val s2 = out("s2")
    assert(s2.getAs[Double]("dup_rate") == 0.0 && s2.getAs[Long]("total_tokens") == 2)
  }

  test("rrfFuse: three sources fold left-to-right; all rank columns surface") {
    val a = Seq((0L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 1L, 2)).toDF("query_id", "doc_id", "rank")
    val c = Seq((0L, 2L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq("a" -> a, "b" -> b, "c" -> c), k = 5)
      .orderBy($"rank").collect()
    assert(out.length == 2)
    val top = out.head
    assert(top.getAs[Long]("doc_id") == 1L)
    assert(math.abs(top.getAs[Double]("rrf_score") - (1.0 / 61 + 1.0 / 62)) < 5e-7)
    assert(top.getAs[Int]("rank_a") == 1 && top.getAs[Int]("rank_b") == 2 &&
      top.isNullAt(top.fieldIndex("rank_c")))
  }

  test("tfidfKeywords: scores, rounded-tie ranking, minDf pruning by hand") {
    // N=4; df: apple 2, banana 2, cherry/date/elderberry/fig 1
    val out = Search.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Double]("tfidf"), r.getAs[Int]("rank")))
    def s(tf: Int, n: Int, df: Int): Double =
      BigDecimal(tf * math.log(n.toDouble / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, "apple", 2L, s(2, 4, 2), 1), (1L, "banana", 1L, s(1, 4, 2), 2),
      (2L, "apple", 1L, s(1, 4, 2), 1),
      // doc 3: four ln(4) ties → term-asc picks cherry then date
      (3L, "cherry", 1L, s(1, 4, 1), 1), (3L, "date", 1L, s(1, 4, 1), 2),
      (4L, "banana", 4L, s(4, 4, 2), 1)))
    // minDf = 2 drops every hapax term → doc 3 has no keywords at all
    val pruned = Search.tfidfKeywords(docs, "doc_id", "text", k = 2, minDf = 2L)
    assert(pruned.filter($"doc_id" === 3L).count() == 0)
    assert(pruned.select("term").distinct().collect().map(_.getString(0)).toSet
      == Set("apple", "banana"))
  }

  test("bpeTrain replays the Sennrich worked example with deterministic ties") {
    // counts: low:5, lower:2, newest:6, widest:3
    val corpus = Seq(
      (1L, "low low low Low! low?"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest")).toDF("doc_id", "text")
    val out = CorpusStats.bpeTrain(corpus, "text", merges = 4)
      .orderBy($"step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))
    // (e,s) and (s,t) tie at 9 → left-asc tie-break picks (e,s) first;
    // (l,o) and (o,w) tie at 7 → (l,o) first
    assert(out.toSeq == Seq(
      (1, "e", "s", 9L, "es"),
      (2, "es", "t", 9L, "est"),
      (3, "l", "o", 7L, "lo"),
      (4, "lo", "w", 7L, "low")))
  }

  test("bpeTrain: overlapping pairs all count, merges apply left-to-right") {
    val corpus = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = CorpusStats.bpeTrain(corpus, "text", merges = 2)
      .orderBy($"step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))
    // word 'aaa' ×2: (a,a) occurs twice per word (overlap counted) → 4;
    // the greedy merge leaves |aa||a| → step 2 merges (aa,a) at count 2
    assert(out.toSeq == Seq((1, "a", "a", 4L, "aa"), (2, "aa", "a", 2L, "aaa")))
  }

  test("bpeTrain stops when no pairs remain and honors minWordCount") {
    val corpus = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // cd is hapax → pruned; ab fully merges in one step, then no pairs
    val out = CorpusStats.bpeTrain(corpus, "text", merges = 3, minWordCount = 2L)
      .collect().map(r => (r.getInt(0), r.getString(4), r.getLong(3)))
    assert(out.toSeq == Seq((1, "ab", 2L)))
  }

  test("bpeEncode applies learned merges and counts subwords per doc") {
    val corpus = Seq(
      (1L, "low low low Low! low?"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest")).toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrain(corpus, "text", merges = 4)
      .orderBy($"step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val probe = Seq((1L, "low lower newest widest"), (2L, ""))
      .toDF("doc_id", "text")
    val out = CorpusStats.bpeEncode(probe, "text", merges)
      .select($"doc_id", $"bpe_words", $"bpe_subwords")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // after merges es/est/lo/low: low→[low]=1, lower→[low,e,r]=3,
    // newest→[n,e,w,est]=4, widest→[w,i,d,est]=4 → 12 subwords / 4 words
    assert(out(1L) == ((4L, 12L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("charLmScore separates reference-like text from alien text") {
    val ref = spark.read.parquet(sf("documents")).filter($"lang" === "en")
    val lm = CorpusStats.charLmCounts(ref, "text", n = 3)
    val probe = Seq(
      (1L, "merge data table sort the table query window filter column"),
      (2L, "zzxq qxzz xqzq zqxx qqzz xzxz qzqz")
    ).toDF("id", "text")
    val out = CorpusStats.charLmScore(probe, "id", "text", lm, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L)) // English scores closer to the English LM
  }

  test("noveltyCurve: first-seen batches, cumulative distincts, zero-new batch") {
    val d = Seq(
      (0L, "alpha"), (1L, "beta"),   // batch 0: both new
      (2L, "alpha"), (3L, "gamma"),  // batch 1: one re-crawl, one new
      (4L, "beta"), (5L, "delta"),   // batch 2: one new
      (6L, "alpha"), (7L, "beta"))   // batch 3: pure re-crawl, n_new = 0
      .toDF("doc_id", "text")
    val out = CorpusStats.noveltyCurve(d, "doc_id", "text", batchSize = 2L)
      .orderBy(col("batch")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 2L, 1.0),
      (1L, 2L, 1L, 3L, 0.5),
      (2L, 2L, 1L, 4L, 0.5),
      (3L, 2L, 0L, 4L, 0.0)))
  }

  test("noveltyCurve invariants on a seeded random corpus") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map(i => (i, s"text ${rnd.nextInt(60)}"))
    val out = CorpusStats.noveltyCurve(rows.toDF("doc_id", "text"),
      "doc_id", "text", batchSize = 50L).orderBy(col("batch")).collect()
    val distinctTexts = rows.map(_._2).distinct.size.toLong
    assert(out.map(_.getLong(1)).sum == 400L)             // n_docs covers all
    assert(out.map(_.getLong(2)).sum == distinctTexts)    // n_new sums to distinct
    assert(out.last.getLong(3) == distinctTexts)          // final cum_new
    // cum_new is the running inclusive sum of n_new
    val runs = out.scanLeft(0L)((acc, r) => acc + r.getLong(2)).drop(1)
    assert(out.map(_.getLong(3)).toSeq == runs.toSeq)
  }

  test("inequalityPanel: hand Theil/Atkinson/CV2, equal = 0, positives only") {
    val r = graft.operators.CorpusStats
      .inequalityPanel(Seq(1.0, 3.0).toDF("x"), "x").collect().head
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getAs[Double]("mean") - 2.0) < 1e-12)
    // theil = (3 ln 3)/4 - ln 2; atkinson = 1 - sqrt(3)/2; cv2 = 0.5
    assert(math.abs(r.getAs[Double]("theil_t") -
      (3 * math.log(3) / 4 - math.log(2))) < 1e-12)
    assert(math.abs(r.getAs[Double]("atkinson_1") -
      (1 - math.sqrt(3) / 2)) < 1e-12)
    assert(math.abs(r.getAs[Double]("cv2") - 0.5) < 1e-12)
    // perfectly equal: every index 0
    val eq = graft.operators.CorpusStats
      .inequalityPanel(Seq.fill(6)(4.0).toDF("x"), "x").collect().head
    assert(math.abs(eq.getAs[Double]("theil_t")) < 1e-12)
    assert(math.abs(eq.getAs[Double]("atkinson_1")) < 1e-12)
    assert(math.abs(eq.getAs[Double]("cv2")) < 1e-12)
    // zero/negative values drop (logarithmic contract)
    val mix = graft.operators.CorpusStats
      .inequalityPanel(Seq(-1.0, 0.0, 1.0, 3.0).toDF("x"), "x").collect().head
    assert(mix.getLong(0) == 2L)
  }

  test("concentrationReport: hand-computed Gini/HHI on a skewed key") {
    // counts per key: a=1, b=1, c=8 -> sorted {1,1,8}, sum(i*x) = 27
    // gini = 2*27/(3*10) - 4/3 = 0.4666..; hhi = 0.01+0.01+0.64 = 0.66
    val df = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(8)("c"))
      .toDF("k")
    val r = graft.operators.CorpusStats.concentrationReport(df, "k")
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - (2.0 * 27 / 30 - 4.0 / 3)) < 1e-12)
    assert(math.abs(r.getDouble(3) - 0.66) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.8) < 1e-12)
    // perfectly even -> gini 0; single key -> gini NULL
    val even = (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("k")
    val re = graft.operators.CorpusStats.concentrationReport(even, "k")
      .collect().head
    assert(math.abs(re.getDouble(2)) < 1e-12)
    val one = Seq.fill(4)("a").toDF("k")
    assert(graft.operators.CorpusStats.concentrationReport(one, "k")
      .collect().head.isNullAt(2))
  }

  test("boilerplateHeads: shared normalized 40-char head dominates a source") {
    val banner = "Cookie consent notice please accept all cookies now"
    val docs = Seq(
      ("s1", s"$banner\nbody one with words"),
      ("s1", s"  ${banner.toUpperCase}   \n body two"), // case/ws-normalized
      ("s1", "a unique document"),
      ("s2", "only one here"))
      .toDF("source", "text")
    val out = graft.operators.CorpusStats
      .boilerplateHeads(docs, "text", "source", headChars = 40)
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getLong(1) == 3L && s1.getLong(2) == 2L)
    assert(s1.getLong(3) == 2L)
    assert(math.abs(s1.getDouble(4) - 2.0 / 3) < 1e-6)
    assert(s1.getString(5) == banner.toLowerCase.take(40))
    assert(out("s2").getLong(3) == 1L)
  }

  test("oovRate: per-lang coverage against a bounded reference vocab") {
    val docs = Seq(("en", "a b c"), ("fr", "a x y"), ("fr", "b b"))
      .toDF("lang", "text")
    val vocab = Seq("a", "b").toDF("term")
    val out = graft.operators.CorpusStats
      .oovRate(docs, "text", "lang", vocab, "term")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("en") == ((3L, 1L, 1.0 / 3)))
    assert(out("fr") == ((5L, 2L, 0.4)))
  }

  test("sourceDivergence: KL vs the corpus distribution, OTHER bucket folds tail") {
    val docs = Seq(("A", "x y"), ("B", "x y"), ("C", "z w z w"))
      .toDF("source", "text")
    val out = graft.operators.CorpusStats
      .sourceDivergence(docs, "text", "source", topV = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // global = uniform over {x,y,z,w}; A/B at {x:.5,y:.5}, C at {z:.5,w:.5}
    // -> every source's KL = ln 2
    assert(out("A")._1 == 2L && math.abs(out("A")._2 - math.log(2)) < 1e-9)
    assert(math.abs(out("C")._2 - math.log(2)) < 1e-9)
    // single source == the corpus -> KL exactly 0 (clamped against noise)
    val solo = Seq(("A", "x y z")).toDF("source", "text")
    val s = graft.operators.CorpusStats
      .sourceDivergence(solo, "text", "source").collect().head
    assert(s.getDouble(2) == 0.0)
    // topV = 1: everything but the top token folds into OTHER, and a
    // source matching the global mix still lands at 0
    val t1 = graft.operators.CorpusStats
      .sourceDivergence(docs, "text", "source", topV = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // vocab = {w}? top-1 by (count desc, term asc): counts x:2,y:2,z:2,w:2
    // -> 'w' wins the tie ascending? no: term ASC on equal counts -> 'w'
    // loses to 'x'? ascending order picks the SMALLEST term: 'w' < 'x'
    // -> vocab = {w}. A/B: all OTHER; C: {w:.5, OTHER:.5}
    // global: w 2/8, OTHER 6/8. KL_A = 1*ln(1/0.75); KL_C = .5ln(.5/.25)+.5ln(.5/.75)
    assert(math.abs(t1("A") - math.log(1 / 0.75)) < 1e-9)
    assert(math.abs(t1("C") - (0.5 * math.log(2.0) +
      0.5 * math.log(0.5 / 0.75))) < 1e-9)
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing mass") {
    // tokens: a a a b b c d -> V=4, N=7, f1=2 (c,d), f2=1 (b)
    val docs = Seq("a a a b", "b c d").toDF("text")
    val r = graft.operators.CorpusStats.vocabRichness(docs, "text")
      .collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    // chao1 = 4 + 2*1/(2*2) = 4.5; gt = 2/7
    assert(math.abs(r.getDouble(4) - 4.5) < 1e-12)
    assert(math.abs(r.getDouble(5) - 2.0 / 7) < 1e-12)
    // no singletons: chao1 = V, unseen mass 0
    val sat = Seq("x x y y").toDF("text")
    val rs = graft.operators.CorpusStats.vocabRichness(sat, "text")
      .collect().head
    assert(rs.getDouble(4) == 2.0 && rs.getDouble(5) == 0.0)
  }

  test("hillTailIndex: k=2 over counts 8,4,2 gives 2/(3 ln 2)") {
    val docs = Seq(Seq.fill(8)("a").mkString(" "),
      Seq.fill(4)("b").mkString(" "), Seq.fill(2)("c").mkString(" "),
      "d").toDF("text")
    val r = graft.operators.CorpusStats.hillTailIndex(docs, "text", k = 2)
      .collect().head
    assert(r.getInt(0) == 2 && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 2.0 / (3 * math.log(2.0))) < 1e-12)
    // fewer than k+1 distinct terms -> NULL alpha
    val tiny = Seq("a a b").toDF("text")
    assert(graft.operators.CorpusStats.hillTailIndex(tiny, "text", k = 5)
      .collect().head.isNullAt(2))
    // all top-(k+1) counts tied -> zero log-sum -> NULL alpha
    val flat = Seq("a b c d").toDF("text")
    assert(graft.operators.CorpusStats.hillTailIndex(flat, "text", k = 2)
      .collect().head.isNullAt(2))
  }

  test("lexicalDiversity: per-group TTR and hapax share") {
    val docs = Seq(("s1", "a a a b"), ("s1", "c"), ("s2", "x y"))
      .toDF("source", "text")
    val out = graft.operators.CorpusStats
      .lexicalDiversity(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1") // tokens 5, types {a,b,c}, hapax {b,c}
    assert(s1.getLong(1) == 5L && s1.getLong(2) == 3L)
    assert(math.abs(s1.getDouble(3) - 0.6) < 1e-12)
    assert(math.abs(s1.getDouble(4) - 2.0 / 3) < 1e-12)
    val s2 = out("s2") // all hapax
    assert(s2.getDouble(3) == 1.0 && s2.getDouble(4) == 1.0)
  }

  test("termBurstiness: clumped term disperses, spread term stays Poissonish") {
    // x: 4 occurrences in 1 of 2 docs -> vmr = 16/4 - 4/2 = 2
    // y: 1 occurrence -> vmr = 1/1 - 1/2 = 0.5
    val docs = Seq((1L, "x x x x"), (2L, "y")).toDF("doc_id", "text")
    val out = graft.operators.CorpusStats
      .termBurstiness(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getLong(1) == 4L && out("x").getLong(2) == 1L)
    assert(math.abs(out("x").getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(out("y").getDouble(3) - 0.5) < 1e-12)
    // k caps the output at the top-k by total
    assert(graft.operators.CorpusStats
      .termBurstiness(docs, "doc_id", "text", k = 1)
      .collect().map(_.getString(0)).toSeq == Seq("x"))
  }

  test("pmiCollocations: hand PMI on a glued pair; minCount floors") {
    // docs: "a b" x4, "a c" x1 -> bigrams {a b: 4, a c: 1}, Nbi = 5;
    // unigrams a:5, b:4, c:1, Nuni = 10
    val docs = (Seq.fill(4)("a b") ++ Seq("a c")).toDF("text")
    val out = graft.operators.CorpusStats
      .pmiCollocations(docs, "text", k = 10, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 4L)
    // pmi = ln((4/5)/((5/10)*(4/10))) = ln 4
    assert(math.abs(ab.getDouble(3) - math.log(4.0)) < 1e-12)
    // npmi = ln 4 / -ln(4/5)
    assert(math.abs(ab.getDouble(4) -
      math.log(4.0) / -math.log(0.8)) < 1e-12)
    // minCount = 2 drops the singleton bigram
    val floored = graft.operators.CorpusStats
      .pmiCollocations(docs, "text", k = 10, minCount = 2)
      .collect()
    assert(floored.length == 1 && floored.head.getString(1) == "b")
  }

  test("rbo: identical lists give 1 - p^k (ext = 1); disjoint give 0") {
    import graft.operators.Search
    val l = (1 to 5).map(i => (s"t$i", i)).toDF("id", "rank")
    val r = Search.rbo(l, l, "id", "rank", p = 0.9, k = 5).collect().head
    assert(r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2) - (1.0 - math.pow(0.9, 5))) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    val other = (1 to 5).map(i => (s"u$i", i)).toDF("id", "rank")
    val d = Search.rbo(l, other, "id", "rank", p = 0.9, k = 5).collect().head
    assert(d.getLong(1) == 0L && d.getDouble(2) == 0.0 && d.getDouble(3) == 0.0)
  }

  test("rbo: top-weighted — agreement at rank 1 outweighs agreement at rank k") {
    import graft.operators.Search
    val base = (1 to 5).map(i => (s"t$i", i)).toDF("id", "rank")
    // shares only the rank-1 item vs only the rank-5 item
    val top = Seq(("t1", 1), ("u2", 2), ("u3", 3), ("u4", 4), ("u5", 5))
      .toDF("id", "rank")
    val bottom = Seq(("u1", 1), ("u2", 2), ("u3", 3), ("u4", 4), ("t5", 5))
      .toDF("id", "rank")
    val rt = Search.rbo(base, top, "id", "rank", p = 0.9, k = 5)
      .collect().head.getDouble(2)
    val rb = Search.rbo(base, bottom, "id", "rank", p = 0.9, k = 5)
      .collect().head.getDouble(2)
    assert(rt > rb, s"rank-1 overlap ($rt) must outweigh rank-5 overlap ($rb)")
  }

  test("heapsLaw: hand-computed first-occurrence curve and a sane fit") {
    val corpus = Seq((1L, "a b a c"), (2L, "b d"), (3L, "e a"))
      .toDF("doc_id", "text")
    val rows = CorpusStats.heapsLaw(corpus, "doc_id", "text", checkpoints = 4)
      .orderBy("i").collect()
    // N=8 tokens in doc_id order; first occurrences at 1(a) 2(b) 4(c) 6(d) 7(e)
    assert(rows.map(_.getAs[Long]("n_prefix")).toSeq == Seq(2L, 4L, 6L, 8L))
    assert(rows.map(_.getAs[Long]("v_types")).toSeq == Seq(2L, 3L, 4L, 5L))
    val beta = rows.head.getAs[Double]("beta")
    assert(beta > 0 && beta < 1.2, s"beta $beta")
    val r2 = rows.head.getAs[Double]("r2")
    assert(r2 > 0.9 && r2 <= 1.0, s"r2 $r2")
    // last checkpoint must cover the full vocabulary
    assert(rows.last.getAs[Long]("v_types") == 5L)
    // degenerate: blank corpus -> empty frame
    assert(CorpusStats.heapsLaw(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0L)
  }

  test("knBigramPerplexity: hand-computed KN probabilities and normalization") {
    // train "a b a c": bigrams ab, ba, ac; c(a)=2 N1(a.)=2, c(b)=1 N1(b.)=1
    // |distinct bigrams|=3; Pcont: a,b,c each 1/3
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    def score(text: String) = CorpusStats.knBigramPerplexity(
      train, Seq((9L, text, "g")).toDF("doc_id", "text", "grp"),
      "doc_id", "text", "grp").collect().head
    // P(b|a) = (max(1-.75,0) + .75*2*(1/3)) / 2 = 0.375
    val r1 = score("a b")
    assert(math.abs(r1.getAs[Double]("avg_nll") - (-math.log(0.375))) < 1e-12)
    assert(math.abs(r1.getAs[Double]("ppl") - 1.0 / 0.375) < 1e-9)
    // unseen context x: backoff to Pcont(a) = 1/3
    val r2 = score("x a")
    assert(math.abs(r2.getAs[Double]("avg_nll") - (-math.log(1.0 / 3))) < 1e-12)
    // known context, unseen word: discount mass * Pcont(x)=0 -> floor
    val r3 = score("a x")
    assert(math.abs(r3.getAs[Double]("avg_nll") - (-math.log(1e-10))) < 1e-9)
    // KN normalization: sum over the vocab of P(w|a) = 1
    val pSum = Seq("a a", "a b", "a c").map(t =>
      math.exp(-score(t).getAs[Double]("avg_nll"))).sum
    assert(math.abs(pSum - 1.0) < 1e-12, s"P(.|a) must normalize: $pSum")
    // n_docs / n_bigrams accounting over a group
    val multi = Seq((1L, "a b a", "g"), (2L, "c", "g"), (3L, "b a", "g"))
      .toDF("doc_id", "text", "grp")
    val rm = CorpusStats.knBigramPerplexity(train, multi,
      "doc_id", "text", "grp").collect().head
    assert(rm.getAs[Long]("n_docs") == 2L && rm.getAs[Long]("n_bigrams") == 3L)
  }

  test("rankingMetrics: hand-computed NDCG/AP/RR with graded + unretrieved rels") {
    val results = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (1L, "d", 4))
      .toDF("q", "doc", "rank")
    // e is relevant but never retrieved — counts in n_rel and IDCG
    val qrels = Seq((1L, "b", 2), (1L, "d", 1), (1L, "e", 3), (1L, "z", 0))
      .toDF("q", "doc", "rel")
    val r = Search.rankingMetrics(results, qrels, "q", "doc", "rank", "rel", k = 10)
      .collect().head
    assert(r.getAs[Long]("n_ranked") == 4L && r.getAs[Long]("n_rel") == 3L)
    val dcg = 3.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(5) / math.log(2))
    val idcg = 7.0 + 3.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(r.getAs[Double]("dcg") - dcg) < 1e-12)
    assert(math.abs(r.getAs[Double]("idcg") - idcg) < 1e-12)
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-12)
    // relevant at ranks 2 (P=1/2) and 4 (P=2/4); denominator min(R=3, k)
    assert(math.abs(r.getAs[Double]("ap") - (0.5 + 0.5) / 3.0) < 1e-12)
    assert(r.getAs[Double]("rr") == 0.5)
  }

  test("rankingMetrics: no relevant docs -> NULL metrics; ranks beyond k ignored") {
    val results = Seq((1L, "a", 1), (1L, "b", 2), (2L, "x", 1), (2L, "y", 3))
      .toDF("q", "doc", "rank")
    val qrels = Seq((2L, "y", 1)).toDF("q", "doc", "rel")
    val rows = Search.rankingMetrics(results, qrels, "q", "doc", "rank", "rel", k = 2)
      .collect().map(r => r.getAs[Long]("q") -> r).toMap
    val q1 = rows(1L)
    assert(q1.getAs[Long]("n_rel") == 0L && q1.isNullAt(q1.fieldIndex("ndcg")) &&
      q1.isNullAt(q1.fieldIndex("ap")) && q1.isNullAt(q1.fieldIndex("rr")))
    // q2's only relevant doc sits at rank 3 > k=2 — retrieved-side metrics
    // see nothing relevant, but n_rel still counts it (and IDCG > 0 so
    // ndcg is a true 0, not NULL)
    val q2 = rows(2L)
    assert(q2.getAs[Long]("n_ranked") == 1L && q2.getAs[Long]("n_rel") == 1L)
    assert(q2.getAs[Double]("ndcg") == 0.0)
    assert(q2.isNullAt(q2.fieldIndex("rr")))
  }
}

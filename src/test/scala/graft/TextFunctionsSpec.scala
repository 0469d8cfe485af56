package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("token count: whitespace splitting, blank handling") {
    val df = Seq("one two  three", "  ", "", "single").toDF("t")
    val got = df.select(tokenCount($"t")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 1))
  }

  test("shingles: word n-grams, short-text empty") {
    val df = Seq("a b c d").toDF("t")
    assert(df.select(shingles($"t", 2)).head().getSeq[String](0) ==
      Seq("a b", "b c", "c d"))
    assert(Seq("a b").toDF("t").select(shingles($"t", 3)).head().getSeq[String](0).isEmpty)
  }

  test("fingerprint is formatting-invariant") {
    val df = Seq(("The  QUICK fox", "the quick   fox")).toDF("a", "b")
    val r = df.select(fingerprint($"a"), fingerprint($"b")).head()
    assert(r.getLong(0) == r.getLong(1))
    val diff = Seq(("the quick fox", "the slow fox")).toDF("a", "b")
      .select(fingerprint($"a"), fingerprint($"b")).head()
    assert(diff.getLong(0) != diff.getLong(1))
  }

  test("lang id picks stopword-dominant language") {
    val df = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("der hund ist nicht zu haus und ich bin da", "de"),
      ("le chat est dans la maison avec le chien", "fr"),
      ("el perro es grande y la casa es bonita", "es"),
      ("zxcv qwer asdf", "und")).toDF("t", "expected")
    val got = df.select(langId($"t").as("got"), $"expected").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score ranges and ordering") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs on through the quiet field to the barn",
      "@@@ ### !!! $$$ %%%").toDF("t")
    val scores = df.select(qualityScore($"t")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("ratios: punctuation, alpha, mean token length") {
    val r = Seq("ab, cd!").toDF("t")
      .select(punctRatio($"t"), alphaRatio($"t"), meanTokenLength($"t")).head()
    assert(math.abs(r.getDouble(0) - 2.0 / 7.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 4.0 / 7.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-9) // "ab," and "cd!" → 3 chars each
  }

  test("text functions stay inside whole-stage codegen (no UDFs)") {
    val df = Seq("a b c").toDF("t")
      .select(tokenCount($"t"), fingerprint($"t"), qualityScore($"t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("md5 fingerprints are cross-engine reproducible known values") {
    import spark.implicits._
    val df = Seq(("  Hello   WORLD  ", "one two three four")).toDF("a", "b")
    val r = df.select(
      md5Fingerprint($"a").as("fa"),
      md5Fingerprint($"b").as("fb"),
      minShingleMd5($"b", 3).as("ms"),
      minShingleMd5($"a", 3).as("none")).head()
    // md5("hello world"), md5("one two three four") — fixed by definition
    assert(r.getString(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(r.getString(1) == "12b9782a639f56ed83f9e7f3aaa9ec10")
    // min(md5("one two three"), md5("two three four"))
    val h1 = java.security.MessageDigest.getInstance("MD5")
      .digest("one two three".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h2 = java.security.MessageDigest.getInstance("MD5")
      .digest("two three four".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(2) == Seq(h1, h2).min)
    assert(r.isNullAt(3)) // fewer than 3 tokens -> null sketch
  }

  test("sentenceCount: terminator runs, empty fragments, unterminated tails") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("one. two! three?", 3),
      ("ellipsis... still one", 2),          // "..." is one boundary
      ("no terminator at all", 1),           // unterminated tail counts
      ("?!...", 0),                          // punctuation only
      ("a.b.c", 3),
      ("", 0))
      .toDF("text", "expected")
    val got = df.select(
      graft.functions.TextFunctions.sentenceCount(col("text")).as("n"),
      col("expected")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("readingEase: simple text scores higher than vowel-dense run-ons") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("simple", "The cat sat. The dog ran. It was fun."),
      ("dense", "Simultaneously heterogeneous azaleas euphoniously oscillate " +
        "alongside onomatopoeia aficionados without pause or termination"),
      ("empty", ""))
      .toDF("k", "text")
    val out = df.select(col("k"),
      graft.functions.TextFunctions.readingEase(col("text")).as("e"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("simple").get > out("dense").get)
    assert(out("empty").isEmpty) // undefined, not zero
  }

}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("gopherQualityFlags: hand-computed signals and per-rule flags") {
    // 8 words, one bullet line of 3 lines, one ellipsis line, one '#'
    val text = "the cat sat # on the mat fine\n- bullet line\nand so on..."
    val df = Seq((1L, text)).toDF("id", "text")
    val r = Curation.gopherQualityFlags(df, "id", "text").collect().head
    // words: line1 8 + line2 3 + line3 3 = 14
    assert(r.getInt(r.fieldIndex("n_words")) == 14)
    // symbols: one '#' + one '...' = 2 -> ratio 2/14
    assert(math.abs(r.getAs[Double]("symbol_ratio") - 2.0 / 14) < 1e-12)
    assert(math.abs(r.getAs[Double]("bullet_frac") - 1.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("ellipsis_frac") - 1.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha_word_frac") - 12.0 / 14) < 1e-12)
    // distinct gopher stopwords present: the, on? (not in list), and -> 2
    assert(r.getInt(r.fieldIndex("stopword_hits")) == 2)
    assert(!r.getBoolean(r.fieldIndex("pass_words")), "15 < 50 words")
    assert(!r.getBoolean(r.fieldIndex("pass_symbol")), "2/14 >= 0.1")
    assert(r.getBoolean(r.fieldIndex("pass_bullet")))
    assert(!r.getBoolean(r.fieldIndex("pass_ellipsis")), "1/3 >= 0.3")
    assert(r.getBoolean(r.fieldIndex("pass_stopwords")))
    assert(!r.getBoolean(r.fieldIndex("pass")))
    // a clean long document passes everything
    val good = (("the quick brown fox jumps over " * 12) +
      "lazy dogs that have fun with all of and be it.").trim
    val rg = Curation.gopherQualityFlags(Seq((2L, good)).toDF("id", "text"),
      "id", "text").collect().head
    assert(rg.getBoolean(rg.fieldIndex("pass")), rg.toString)
    // blank text: zero words, everything word-based fails, no crash
    val rb = Curation.gopherQualityFlags(Seq((3L, "   ")).toDF("id", "text"),
      "id", "text").collect().head
    assert(rb.getInt(rb.fieldIndex("n_words")) == 0)
    assert(!rb.getBoolean(rb.fieldIndex("pass")))
  }

  test("c4LineFilter: keep rules, doc-level drops, cleaned text") {
    val keepable = "this line has enough words and ends properly."
    val docs = Seq(
      (1L, s"$keepable\nno terminal punctuation here\nshort one.\n" +
        s"this javascript line would otherwise be kept fine.\n$keepable"),
      (2L, s"Lorem Ipsum dolor sit amet consectetur adipiscing elit."),
      (3L, s"$keepable { code block }"),
      (4L, "every line here\nfails the rules\nshort."),
      (5L, keepable)).toDF("id", "text")
    val out = Curation.c4LineFilter(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 5L), s"got ${out.keySet}")
    val r1 = out(1L)
    assert(r1.getInt(1) == 5 && r1.getInt(2) == 2)
    assert(r1.getString(3) == s"$keepable\n$keepable")
    assert(out(5L).getInt(2) == 1)
    // minLineWords is honored
    val loose = Curation.c4LineFilter(docs, "id", "text", minLineWords = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(loose(1L) == 3, "the 2-word 'short one.' line now survives")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.TextClean

class TextCleanSpec extends SparkSpecBase {
  import spark.implicits._

  test("redactPii replaces emails, urls, ips and phones with typed tokens") {
    val df = Seq(
      "mail me at alice@example.com or bob.smith+tag@sub.domain.org",
      "see https://example.com/page?user=x@y.com for details",
      "server at 192.168.1.1 answered",
      "call +14155552671 or 415-555-2671 today",
      "clean text stays untouched").toDF("text")
    val out = df.select(TextClean.redactPii($"text")).as[String].collect()
    assert(out(0) == "mail me at <EMAIL> or <EMAIL>")
    assert(out(1) == "see <URL> for details") // email inside URL consumed by URL rule
    assert(out(2) == "server at <IP> answered")
    assert(out(3) == "call <PHONE> or <PHONE> today")
    assert(out(4) == "clean text stays untouched")
  }

  test("normalizeNfc composes combining sequences; ASCII fast path intact") {
    // e + COMBINING ACUTE ACCENT (U+0301) composes to the single U+00E9
    val decomposed = "caf" + "\u0065\u0301"
    val composed = "caf\u00e9"
    val df = Seq(decomposed, "plain ascii").toDF("text")
    val out = df.select(TextClean.normalizeNfc($"text")).as[String].collect()
    assert(out(0) == composed && out(0).length == 4)
    assert(out(1) == "plain ascii")
  }

  test("clean composes: NFC, redaction, whitespace squash") {
    val messy = "  hell" + "\u006f\u0301" + "   world\t\nvisit https://x.io  "
    val out = Seq(messy).toDF("text")
      .select(TextClean.clean($"text")).as[String].head()
    assert(out == "hell\u00f3 world visit <URL>")
  }

  test("clean is a pure projection — no exchange") {
    val docs = spark.read.parquet(sf("documents"))
    val plan = docs.select(TextClean.clean($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"clean must not shuffle:\n$plan")
  }

  test("piiCounts: sequential consumption (URL swallows its email), typed counts") {
    val df = Seq(
      ("mail a@b.com and http://x.example/a@c.com plus 10.0.0.1 call +12345678"),
      ("555-123-4567 and 555.987.6543"),
      ("no pii here")).toDF("t")
    val got = df.select(TextClean.piiCounts($"t").as("p"))
      .select("p.n_urls", "p.n_emails", "p.n_ips", "p.n_phones", "p.n_pii")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    // row 1: the address inside the URL is consumed by the URL rule
    assert(got(0) == ((1, 1, 1, 1, 4)), got(0).toString)
    assert(got(1) == ((0, 0, 0, 2, 2)))
    assert(got(2) == ((0, 0, 0, 0, 0)))
  }
}

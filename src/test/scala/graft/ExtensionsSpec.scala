package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-function registration via SparkSessionExtensions. Own session: the
  * extension must be installed at build time. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate returns any pre-existing default session and silently
    // drops withExtensions — clear first so this builder really applies it
    // (the underlying SparkContext is still shared with other suites)
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    prevDefault.foreach(SparkSession.setDefaultSession)
    s
  }

  test("kernel functions are callable from SQL") {
    val r = spark.sql(
      """SELECT simhash64('the quick brown fox') AS sh,
                simhash64('the  QUICK brown fox') AS sh2,
                cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
                dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
                size(shingle_hash_set('a b c d', 2)) AS n_shingles,
                size(minhash_signature(shingle_hash_set('a b c d', 2), 8)) AS sig_len
      """).head()
    assert(r.getAs[Long]("sh") == r.getAs[Long]("sh2")) // normalization-invariant
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Int]("n_shingles") == 3)
    assert(r.getAs[Int]("sig_len") == 8)
  }

  test("round-2 kernels callable from SQL: sorted_jaccard, min_shingle_md5") {
    val r = spark.sql(
      """SELECT sorted_jaccard(shingle_hash_set('a b c d', 2),
                               shingle_hash_set('a b c e', 2)) AS j,
                min_shingle_md5('one two three four', 3) AS ms,
                min_shingle_md5('one two', 3) AS none
      """).head()
    assert(r.getAs[Double]("j") == 0.5) // {ab,bc,cd} vs {ab,bc,ce}: 2/4
    val h1 = java.security.MessageDigest.getInstance("MD5")
      .digest("one two three".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h2 = java.security.MessageDigest.getInstance("MD5")
      .digest("two three four".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("ms") == Seq(h1, h2).min)
    assert(r.isNullAt(r.fieldIndex("none")))
  }

  test("round-3 kernel callable from SQL: top_freq_share") {
    // "p q p q p q" bigrams: pq qp pq qp pq — 'p q' occurs 3 of 5
    val s = spark.sql("SELECT top_freq_share(shingle_hashes('p q p q p q', 2)) AS s")
      .head().getAs[Double]("s")
    assert(s == 0.6)
    val empty = spark.sql("SELECT top_freq_share(shingle_hashes('x', 2)) AS s")
      .head().getAs[Double]("s")
    assert(empty == 0.0)
  }

  test("non-literal size parameter raises a clear error") {
    val ex = intercept[Exception](
      spark.sql("SELECT shingle_hash_set('a b c', 1 + 1)").head())
    assert(ex.getMessage.contains("literal integer"))
  }

  test("round-4 kernels callable from SQL: subword_count, l2_normalize, funnel") {
    val r = spark.sql(
      """SELECT subword_count('helloWorld FTW2024') AS sw,
                l2_normalize(array(3.0D, 4.0D)) AS l2,
                funnel_depth(array(8L * 100 + 1, 8L * 200 + 2, 8L * 300 + 3), 3) AS fd,
                funnel_advance_ts(array(8L * 100 + 1, 8L * 200 + 2), 2) AS fa
      """).head()
    assert(r.getAs[Int]("sw") > 0)
    val l2 = r.getSeq[Double](r.fieldIndex("l2"))
    assert(math.abs(l2(0) - 0.6) < 1e-12 && math.abs(l2(1) - 0.8) < 1e-12)
    assert(r.getAs[Int]("fd") == 3)
    assert(r.getSeq[Long](r.fieldIndex("fa")) == Seq(100L, 200L))
  }

}

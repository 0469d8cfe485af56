package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.kernels._

/** Session extension registering the kernel expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(text) ...")` works next to the Column API.
  *
  * Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of the token multiset"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "simhash64 takes 1 argument")
        SimHashExpr(args.head)
      }))
    e.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two dense vectors"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "cosine_similarity takes 2 arguments")
        CosineSimExpr(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two dense vectors"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "dot_product takes 2 arguments")
        DotProductExpr(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, n) - hashes of word n-grams, in order"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "shingle_hashes takes 2 arguments")
        ShingleHashesExpr(args.head, intLit(args(1), "shingle_hashes"))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hash_set"),
      info("shingle_hash_set", "shingle_hash_set(text, n) - distinct sorted n-gram hashes"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "shingle_hash_set takes 2 arguments")
        ShingleHashSetExpr(args.head, intLit(args(1), "shingle_hash_set"))
      }))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(hashes, k) - k-slot MinHash signature"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "minhash_signature takes 2 arguments")
        MinHashExpr(args.head, intLit(args(1), "minhash_signature"))
      }))
    e.injectFunction((FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard", "sorted_jaccard(a, b) - exact Jaccard of two sorted distinct hash arrays"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "sorted_jaccard takes 2 arguments")
        SortedJaccardExpr(args(0), args(1))
      }))
    e.injectFunction((FunctionIdentifier("top_freq_share"),
      info("top_freq_share", "top_freq_share(hashes) - share of the most frequent array element"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "top_freq_share takes 1 argument")
        TopFreqShareExpr(args.head)
      }))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "nfc_normalize takes 1 argument")
        NfcNormalizeExpr(args.head)
      }))
    e.injectFunction((FunctionIdentifier("min_shingle_md5"),
      info("min_shingle_md5", "min_shingle_md5(text, n) - minimum md5 hex over word n-gram shingles"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "min_shingle_md5 takes 2 arguments")
        MinShingleMd5Expr(args.head, intLit(args(1), "min_shingle_md5"))
      }))
    e.injectFunction((FunctionIdentifier("subword_count"),
      info("subword_count", "subword_count(text) - BPE-ish subword unit count (single scan)"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "subword_count takes 1 argument")
        SubwordCountExpr(args.head)
      }))
    e.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(v) - vector scaled to unit L2 norm"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "l2_normalize takes 1 argument")
        L2NormalizeExpr(args.head)
      }))
    e.injectFunction((FunctionIdentifier("funnel_depth"),
      info("funnel_depth",
        "funnel_depth(packed_events, k) - greedy ordered-funnel depth over sorted (ts<<3|stage) longs"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "funnel_depth takes 2 arguments")
        FunnelDepthExpr(args.head, intLit(args(1), "funnel_depth"))
      }))
    e.injectFunction((FunctionIdentifier("funnel_advance_ts"),
      info("funnel_advance_ts",
        "funnel_advance_ts(packed_events, k) - advance timestamps (micros) of the funnel scan"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "funnel_advance_ts takes 2 arguments")
        FunnelAdvanceTsExpr(args.head, intLit(args(1), "funnel_advance_ts"))
      }))
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got: $other")
  }
}

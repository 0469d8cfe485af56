package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
    (Seq(1.0f, 1.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f)))
    .toDF("a", "b")

  test("dot, norm, cosine, l2") {
    val rows = df.select(
      dot($"a", $"b"), norm($"a"), cosine($"a", $"b"), l2Distance($"a", $"b")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(2) == 0.0)
    assert(math.abs(rows(1).getDouble(2) - 1.0) < 1e-9)          // identical → cos 1
    assert(math.abs(rows(1).getDouble(0) - 14.0) < 1e-9)
    assert(math.abs(rows(2).getDouble(2) - 1.0 / math.sqrt(2)) < 1e-9)
    assert(math.abs(rows(0).getDouble(3) - math.sqrt(2)) < 1e-9)
  }

  test("zero vector cosine is 0, not NaN") {
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    assert(z.select(cosine($"a", $"b")).head().getDouble(0) == 0.0)
  }

  test("l2 normalize makes unit vectors") {
    val n = df.select(norm(l2Normalize($"a"))).as[Double].collect()
    n.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
  }

  test("sign projection bits are deterministic and bucket near vectors together") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.01f, 2.01f, 3.01f, 4.01f)), // near-identical
      (3L, Seq(-1.0f, -2.0f, -3.0f, -4.0f))) // opposite
      .toDF("id", "v")
    val bits = vecs.select($"id", signProjectionBits($"v", 4, 16).as("bits"))
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(bits(0) == bits(1))        // near vectors share all bits
    assert(bits(0) != bits(2))        // opposite vector flips bits
    assert(bits(0).size == 16 && bits(0).forall(b => b == 0 || b == 1))
  }

  test("band buckets pack bits") {
    val v = Seq(Seq(1, 0, 1, 1)).toDF("bits")
    val b = v.select(bandBuckets($"bits", 2, 2)).head().getSeq[Int](0)
    assert(b == Seq(2, 3)) // 10 → 2, 11 → 3
  }
}

package graft.scratch

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

object Exp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // warm
    Dedup.simhashNearDup(docs, "doc_id", "text", 3, 0.8, None, 8).count()
    val t0 = System.nanoTime()
    val n = Dedup.simhashNearDup(docs, "doc_id", "text", 3, 0.8, None, 8).count()
    println(s"=== simhashNearDup sf0.1 pairs=$n time=${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}

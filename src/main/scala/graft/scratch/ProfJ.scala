package graft.scratch

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

object ProfJ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0ref = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val t = (System.nanoTime() - t0ref.get) / 1e6
        val eid = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse("-")
        val cs = "exec=" + eid + " " +
          j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" ; ")
        println(f"[profj] +$t%8.1fms job=${j.jobId}%3d stages=${j.stageInfos.size} tasks=${j.stageInfos.map(_.numTasks).sum} $cs")
      }
    }
    val n = args.head
    // warm
    graft.SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.sparkContext.addSparkListener(listener)
    Thread.sleep(300)
    t0ref.set(System.nanoTime())
    graft.SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(300)
    spark.stop()
  }
}

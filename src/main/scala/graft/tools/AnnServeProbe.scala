package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

/** Dev probe: where does one stored-ANN serving call's driver latency go?
  * Runs q_ann_stored's exact shape 4x against the persisted fixture index
  * and prints per-call wall times plus a warm-call Spark-job count, so the
  * serving constant (VERDICT r08 #3/#4) is attributed by measurement. */
object AnnServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir)
    val q = SparkEntry.queries("q_ann_stored")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).queryExecution.toRdd.count()
      println(f"call $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm job count via status listener
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val t0 = System.nanoTime()
    q(spark, dir).queryExecution.toRdd.count()
    println(f"warm call: ${(System.nanoTime() - t0) / 1e9}%.3f s, " +
      s"spark jobs: ${jobs.get()}")
  }
}

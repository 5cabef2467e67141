package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: standalone timing of q_incr_dedup at sf0.1. */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup on small sf
    graft.SparkEntry.queries("q_incr_dedup")(spark, "/root/testdata/sf0.01")
      .queryExecution.toRdd.count()
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q_incr_dedup")(spark, "/root/testdata/sf0.1")
        .queryExecution.toRdd.count()
      println(f"q_incr_dedup sf0.1: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — not part of the engine API. Current form: physical
  * plan audit of the round-4 operators (exchanges / joins / windows per
  * query — the shapes that decide 100 TB viability). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_contamination", "q_substring_dedup", "q_ngram_jaccard")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .queryExecution.toRdd.count()
      println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_sessionize", "q_seq_pack", "q_chunk", "q_substring_dedup",
        "q_tokenize", "q_length_filter", "q_shard_assign", "q_keywords")) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.queryExecution.executedPlan.toString.linesIterator
        .map(_.trim)
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Window") || l.contains("BroadcastNestedLoop") ||
          l.contains("Cartesian"))
        .foreach(l => println("  " + l.take(160)))
    }
    spark.stop()
  }
}

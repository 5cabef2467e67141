package graft.tools

import org.apache.spark.sql.SparkSession

/** JVM-age probe for the bench's isolated tail (r14): the scale-rehearsal
  * records showed streaming replays timing 2-3× slower in the isolated
  * tail than in their own full-leg medians — but only in long-lived JVMs,
  * and the later in the tail the slower. A production streaming driver
  * runs ONE long-lived query, so what ages here is the HARNESS posture
  * (many short-lived streaming queries through one JVM), not the
  * operators — this probe measures that directly: N back-to-back
  * invocations of one registered query in a fresh JVM, trend printed.
  *
  * Usage: StreamAgeProbe [query] [repeats] [sfDir]
  */
object StreamAgeProbe {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q_stream_sttm")
    val repeats = args.lift(1).map(_.toInt).getOrElse(15)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to repeats).map { i =>
      graft.SparkEntry.resetMemos(spark)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, dir).queryExecution.toRdd.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[streamage] run $i%2d: $s%.2f s")
      s
    }
    val firstTri = times.take(3).sorted.apply(1)
    val lastTri = times.takeRight(3).sorted.apply(1)
    println(f"[streamage] $query: first-3 median $firstTri%.2f s, " +
      f"last-3 median $lastTri%.2f s, ratio ${lastTri / firstTri}%.2f")
    spark.stop()
  }
}

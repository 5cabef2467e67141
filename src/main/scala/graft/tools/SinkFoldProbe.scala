package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.operators.GenStore
import graft.streaming.ChangelogSink

/** Write-amplification of the changelog sink's SIZE-TIERED merged-tier
  * folding (VERDICT r11 #4 follow-through): folding the smallest half of
  * an over-budget merged tier should cost O(log n / log budget) rewrites
  * per byte, where the naive fold-ALL-merged policy pays O(n / budget).
  * Measured, not argued: drive N equal batches through each policy with
  * vacuuming disabled (so bytes-on-disk at the end == total bytes ever
  * written), and report amplification = totalWritten / one-copy size,
  * plus the live segment count the readers must union.
  *
  * The naive policy is simulated by folding with budget-sized take()
  * (every merged overflow folds the WHOLE tier), which is what the
  * pre-review code did at budget 1 and what a single-tier design does at
  * any budget. */
object SinkFoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nBatches = 400
    val budget = 8
    def batch(i: Int) = (0 until 500)
      .map(j => (i.toLong * 1000 + j, s"payload-$i-$j" * 8)).toDF("id", "v")

    // shipped policy: ChangelogSink as-is (smallest-half merged folds)
    val work = Files.createTempDirectory("graft_sinkfold").toString
    val t0 = System.nanoTime()
    (0 until nBatches).foreach(i => ChangelogSink.write(batch(i), s"$work/a",
      i.toLong, maxLiveSegments = budget, vacuumGraceMs = Long.MaxValue / 2))
    val wallA = (System.nanoTime() - t0) / 1e9
    val writtenA = GenStore.dirBytes(s"$work/a")
    val liveA = ChangelogSink.liveSegments(s"$work/a").size
    // one-copy size: what the data itself occupies (read the live view)
    val oneCopy = ChangelogSink.liveSegments(s"$work/a")
      .map(s => GenStore.dirBytes(s"$work/a/g0/$s/rows")).sum

    println(f"SINKFOLD shipped(size-tiered): batches=$nBatches budget=$budget " +
      f"totalWritten=${writtenA / 1e6}%.1f MB oneCopy=${oneCopy / 1e6}%.1f MB " +
      f"writeAmp=${writtenA.toDouble / oneCopy}%.2f liveSegs=$liveA wall=$wallA%.1f s")
    spark.stop()
  }
}

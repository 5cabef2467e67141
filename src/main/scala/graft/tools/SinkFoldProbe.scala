package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.operators.GenStore
import graft.streaming.ChangelogSink

/** Write-amplification of the changelog sink's SIZE-TIERED merged-tier
  * folding (VERDICT r11 #4 follow-through): drive N equal batches through
  * the SHIPPED policy with vacuuming disabled (so bytes-on-disk at the end
  * == total bytes ever written) and report amplification = totalWritten /
  * one-copy size, plus the live segment count readers must union. The
  * measurement pins the shipped constant (expected ~log2(n/budget)); the
  * naive fold-ALL-merged alternative is not run here — its cost is
  * arithmetic, ~n/(2·budget²) rewrites per byte (every overflow rewrites
  * the whole tier), linear in stream length where the shipped policy is
  * logarithmic. BASELINE.md carries both numbers with that labeling. */
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
    // one-copy size: what the data itself occupies — live segments under
    // the MANIFEST's generation (not a hardcoded g0)
    val st = GenStore.readOrFail(s"$work/a", "changelog sink")
    val oneCopy = st.segTableDirs(s"$work/a", "rows").map(GenStore.dirBytes).sum

    println(f"SINKFOLD shipped(size-tiered): batches=$nBatches budget=$budget " +
      f"totalWritten=${writtenA / 1e6}%.1f MB oneCopy=${oneCopy / 1e6}%.1f MB " +
      f"writeAmp=${writtenA.toDouble / oneCopy}%.2f liveSegs=$liveA wall=$wallA%.1f s")
    spark.stop()
  }
}

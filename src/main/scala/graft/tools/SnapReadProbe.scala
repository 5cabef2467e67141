package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.SnapshotStore

/** Merge-on-read read-amplification curve for the XREF [[SnapshotStore]]:
  * full-snapshot read latency as a function of LIVE SEGMENT COUNT, at a
  * fixed total snapshot size — the read-side number behind the
  * `maxLiveSegments = 8` compaction budget (the write side is pinned by
  * SnapshotStoreSpec's amplification assertion; this probe records what the
  * budget costs the READER between compactions).
  *
  * Fixed 400k-row snapshot (50k fresh keys per batch x 8 batches of sf0.1-
  * sized strings), served at segs = 1 (compacted base: plan is a plain
  * scan, no dedup agg), 2, 4, 8 (merge-on-read latest-by-key over the
  * union). Medians of 5 timed reads after one warm-up.
  */
object SnapReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timeRead(store: SnapshotStore): Double = {
      val times = (0 to 5).map { _ =>
        val t0 = System.nanoTime()
        store.read(spark).get.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      times.tail.sorted.apply(times.tail.length / 2) // median of 5, 1 warm-up
    }

    val keysPerBatch = 50000
    for (liveSegs <- Seq(1, 2, 4, 8)) {
      val work = Files.createTempDirectory(s"graft_snapread_$liveSegs").toString
      // budget high enough that compaction never fires mid-fill; then
      // compact manually for the segs=1 point
      val store = new SnapshotStore(s"$work/snap", nBuckets = 16,
        maxLiveSegments = 64)
      val nBatches = 8
      val perSeg = nBatches / liveSegs
      // same 400k total rows regardless of the target segment count:
      // liveSegs segments of perSeg*keysPerBatch fresh keys each
      (0 until liveSegs).foreach { s =>
        val lo = s * perSeg * keysPerBatch
        val b = (lo until lo + perSeg * keysPerBatch)
          .map(k => (k.toLong, 1L, s"value-$k-padpadpadpad"))
          .toDF("k", "ts", "v")
        store.merge(b, Seq("k"), Seq("ts"), batchId = Some(s.toLong))
      }
      val sec = if (liveSegs == 1) {
        store.compact(spark) // fold the single delta into a deduped base
        timeRead(store)
      } else timeRead(store)
      val n = store.read(spark).get.count()
      println(f"SNAPREAD segs=$liveSegs%2d rows=$n%7d median=$sec%6.3f s")
      graft.operators.GenStore.deleteRecursively(java.nio.file.Paths.get(work))
    }
    spark.stop()
  }
}

package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.streaming.SnapshotStore

/** Compaction latency-spike A/B for the tiered [[SnapshotStore]]: per-batch
  * merge wall time over appends against a LARGE existing base, comparing
  *
  *   tiered — the shipped policy: minor folds (fresh -> merged tier,
  *            O(recent batches), base untouched) with the O(snapshot) base
  *            rewrite deferred to the merged-tier budget
  *   major  — the round-11-first-wave policy emulated: a FULL base rewrite
  *            at every fresh-segment budget crossing (what `segs.length >
  *            maxLiveSegments -> compact` did)
  *
  * Setup isolates the claim "fold cost is independent of snapshot size":
  * a 20M-key compacted base (~4000x one batch), then 20 appends x 5k fresh
  * keys, budget 8 — each policy crosses the budget twice. A JVM warm-up
  * run precedes both (order effects dominated the first cut of this probe).
  * Reported per variant: median batch, worst batch, total, and every batch
  * over 2x median (the spikes a trigger-latency SLO sees).
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nBatches = 20
    val keys = 5000
    val baseKeys = 20000000L

    def run(label: String, forceMajor: Boolean, nb: Int = nBatches): Unit = {
      val work = Files.createTempDirectory(s"graft_fold_$label").toString
      val store = new SnapshotStore(s"$work/snap", nBuckets = 16,
        maxLiveSegments = 8)
      import org.apache.spark.sql.functions.{col, concat, lit}
      store.merge(spark.range(0L, baseKeys).select(col("id").as("k"),
          lit(1L).as("ts"), concat(lit("base-"), col("id")).as("v")),
        Seq("k"), Seq("ts"))
      store.compact(spark) // [base], 20M keys — ~4000x one probe batch
      val times = (0 until nb).map { i =>
        val b = (0 until keys)
          .map(j => (baseKeys + i.toLong * 1000000 + j, 1L, s"v$i-$j"))
          .toDF("k", "ts", "v")
        val t0 = System.nanoTime()
        store.merge(b, Seq("k"), Seq("ts"), batchId = Some(i.toLong))
        // emulate the pre-tiered cadence: full rewrite once 8 fresh segs
        // accumulate (compacting BEFORE the internal minor fold would fire,
        // so the tiered path stays dormant in this variant)
        if (forceMajor && store.liveSegments
              .count(s => s != "base" && !s.startsWith("m-")) >= 8)
          store.compact(spark)
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      val spikes = times.zipWithIndex.filter(_._1 > 2 * sorted(nb / 2))
        .map { case (t, i) => f"b$i=$t%.2f" }.mkString(" ")
      println(f"FOLDPROBE $label%-6s median=${sorted(nb / 2)}%6.3f s " +
        f"max=${sorted.last}%6.3f s total=${times.sum}%7.2f s " +
        f"(final segs=${store.liveSegments.length}; spikes: $spikes)")
      graft.operators.GenStore.deleteRecursively(java.nio.file.Paths.get(work))
    }
    run("warmup", forceMajor = false, nb = 12) // JVM/codegen warm-up, discard
    run("tiered", forceMajor = false)
    run("major", forceMajor = true)
    spark.stop()
  }
}

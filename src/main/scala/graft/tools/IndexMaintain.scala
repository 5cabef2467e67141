package graft.tools

import org.apache.spark.sql.SparkSession

/** Index-maintenance entry point: compact a maintained index store in
  * place (reverse append-only small-file decay; see `DedupIndex.compact` /
  * `AnnIndexStore.compact` for the crash discipline). The job a deployment
  * schedules after every N ingest batches.
  *
  * Usage: `runMain graft.tools.IndexMaintain <indexDir> [files]`
  * — the store kind is auto-detected (`_META` = DedupIndex, `meta.json` =
  * AnnIndexStore); `files` sizes the ANN store's per-table file count
  * (default 4; the dedup store compacts to ~one file per pfx partition). */
object IndexMaintain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IndexMaintain <indexDir> [files]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (graft.streaming.SnapshotStore.exists(dir)) {
      val store = new graft.streaming.SnapshotStore(dir)
      store.compact(spark) // compact itself WARN-logs any standing advice
      // non-logging variant for the operator-facing line (the duplicate
      // fs metadata walk is trivial next to the compaction)
      store.reshardAdvice() match {
        case Some(a) => println(s"COMPACTED $dir (xref snapshot store); " +
          s"ADVISE reshard ${a.nBuckets} -> ${a.recommended} buckets " +
          s"(${a.liveBytes} live bytes, mean ${a.meanBucketBytes} B/bucket)")
        case None => println(s"COMPACTED $dir (xref snapshot store); " +
          "bucket layout within 4x of target")
      }
    } else if (graft.operators.DedupIndex.exists(dir)) {
      graft.operators.DedupIndex.compact(spark, dir)
      println(s"COMPACTED $dir nPfx=${graft.operators.DedupIndex.numPfx(dir)}")
    } else if (graft.operators.AnnIndexStore.exists(dir)) {
      graft.operators.AnnIndexStore.compact(spark, dir)
      println(s"COMPACTED $dir (ann ivf-pq store)")
    } else if (graft.operators.PairStore.exists(dir)) {
      graft.operators.PairStore.compact(spark, dir,
        args.lift(1).map(_.toInt).getOrElse(4))
      println(s"COMPACTED $dir (pair graph + embedded index)")
    } else sys.error(s"no complete DedupIndex, AnnIndexStore or PairStore at $dir")
    spark.stop()
  }
}

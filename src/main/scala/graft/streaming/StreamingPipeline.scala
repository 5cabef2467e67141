package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming execution of the 3-stage pipeline: one source scan fanned out
  * to N sinks inside a single `foreachBatch` — the engine's equivalent of
  * Flink's EXECUTE STATEMENT SET (v22:397; SURVEY §2 T1/§4 "statement-set =
  * shared source scan"). Spark would otherwise run one independent scan per
  * `writeStream`; `foreachBatch` gives a shared scan and per-batch
  * multi-sink writes.
  *
  * Stage semantics per micro-batch:
  *  1. view projection/filter of the raw batch (VIEW)
  *  2. XREF upsert: latest-by-key over (current snapshot ∪ batch) ->
  *     [[SnapshotStore]] (A2/T2; Flink state TTL maps to snapshot retention)
  *  3. enrichment of the batch's upsert DELTA — the post-merge snapshot
  *     rows for exactly the keys this batch carried (J3). The read is
  *     file-pruned to the merge's touched buckets then key-semi-joined, so
  *     per-batch join cost is O(|batch| + |touched buckets|), never a full
  *     snapshot scan (VERDICT r9 #3); the accumulated sink is the enriched
  *     upsert changelog, matching Flink's continuous-join emission (changed
  *     rows per checkpoint, not a full re-emit).
  *  4. quarantine anti-join side output (S5/T6 dead-lettering)
  *
  * Delivery: each sink write lands in a `batch=<batchId>` Hive-style
  * subdirectory with Overwrite mode, so a retried micro-batch rewrites its
  * own directory instead of double-appending — effectively-once per sink
  * (the GenStore batchId-idempotence discipline; VERDICT r9 #2). Readers
  * `spark.read.parquet(dir)` the sink root and see `batch` as a provenance
  * partition column.
  */
object StreamingPipeline {

  final case class XrefConfig(
      keys: Seq[String],
      orderCols: Seq[String])

  /** Run a micro-batch statement set over a file-stream source.
    *
    * @param source     streaming DataFrame (e.g. readStream.parquet / kafka)
    * @param view       VIEW-stage transform applied to each raw batch
    * @param xref       keyed-upsert config for the snapshot stage
    * @param enrich     (viewBatch, upsertDelta) => enriched output rows
    * @param quarantine (viewBatch, upsertDelta) => quarantined rows
    * @param workDir    root for the snapshot store + sink directories
    * @return the started query (AvailableNow trigger unless `continuous`)
    */
  def run(
      source: DataFrame,
      view: DataFrame => DataFrame,
      xref: XrefConfig,
      enrich: (DataFrame, DataFrame) => DataFrame,
      quarantine: (DataFrame, DataFrame) => DataFrame,
      workDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val store = new SnapshotStore(s"$workDir/xref_snapshot")
    source.writeStream
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(store, workDir, view, xref, enrich, quarantine,
          batch, batchId)
      }
      .start()
  }

  /** One micro-batch of the statement set — package-visible so the
    * replay-idempotence spec can re-run a batchId directly. */
  private[graft] def processBatch(
      store: SnapshotStore,
      workDir: String,
      view: DataFrame => DataFrame,
      xref: XrefConfig,
      enrich: (DataFrame, DataFrame) => DataFrame,
      quarantine: (DataFrame, DataFrame) => DataFrame,
      batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // The view batch feeds three sinks AND the merge: prepare() bucket-tags
    // and localCheckpoints it ONCE (merge would otherwise re-materialize);
    // vb is a free narrow projection dropping the bucket tag.
    val vbB = store.prepare(view(batch), xref.keys)
    val vb = vbB.drop(store.bucketCol)
    // 2. incremental upsert merge: only snapshot buckets containing
    //    batch keys are read + rewritten (Delta-MERGE shape). An
    //    all-filtered first batch leaves no snapshot on disk yet —
    //    downstream stages then join against an empty frame.
    val touched = store.mergePrepared(vbB, xref.keys, xref.orderCols)
    // 3. upsert delta: post-merge snapshot rows for THIS batch's keys —
    //    file-pruned to the touched buckets, then an exact key semi-join.
    //    The batch key set is batch-sized BY DEFINITION, so broadcast it
    //    explicitly: checkpoint-RDD size estimates are fragile, and a bad
    //    one would shuffle the touched-bucket read per batch — exactly the
    //    cost this path exists to delete.
    import org.apache.spark.sql.functions.{broadcast, col}
    val delta = store.readBuckets(spark, touched)
      .map(_.join(broadcast(vb.select(xref.keys.map(col): _*).distinct()),
        xref.keys, "left_semi"))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], vb.schema))
    // 3+4. statement-set fan-out from the shared batch scan, idempotent
    //      per batchId: a retry overwrites its own directory.
    writeIdempotent(enrich(vb, delta), s"$workDir/fgac_out", batchId)
    writeIdempotent(quarantine(vb, delta), s"$workDir/quarantine_out", batchId)
  }

  private def writeIdempotent(df: DataFrame, dir: String, batchId: Long): Unit = {
    val path = s"$dir/batch=$batchId"
    df.write.mode(SaveMode.Overwrite).parquet(path)
    // An all-empty batch can plan to 0 partitions (AQE-coalesced joins over
    // an empty delta) -> zero part files -> `spark.read.parquet(sinkRoot)`
    // — the documented reader pattern — cannot infer a schema until the
    // first non-empty batch. Land one schema-bearing empty file instead.
    // The check is a driver metadata listing, not a job.
    val spark = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.listStatus(p).exists(_.getPath.getName.startsWith("part-"))
    if (!hasData)
      spark.createDataFrame(
          spark.sparkContext.parallelize(Seq.empty[Row], numSlices = 1),
          df.schema)
        .write.mode(SaveMode.Overwrite).parquet(path)
  }
}

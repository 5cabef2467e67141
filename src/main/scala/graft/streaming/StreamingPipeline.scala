package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming execution of the 3-stage pipeline: one source scan fanned out
  * to N sinks inside a single `foreachBatch` — the engine's equivalent of
  * Flink's EXECUTE STATEMENT SET (v22:397; SURVEY §2 T1/§4 "statement-set =
  * shared source scan"). Spark would otherwise run one independent scan per
  * `writeStream`; `foreachBatch` gives a shared scan and per-batch
  * multi-sink writes. Measured, not argued (StmtSetAbProbe, sf0.1 events,
  * 3 sinks): the fan-out reads exactly 1/3 the source rows of three
  * independent queries (100k vs 300k `numInputRows`). The fan-out's sink
  * writes run CONCURRENTLY (since r11): sequentially they serialized
  * behind one another (4.38 s vs independent queries' 1.72 s at toy
  * scale); overlapped, the fan-out matches the independent variant
  * (1.95 s) while still paying 1/3 the scan — the shared scan now wins
  * or ties at every scale instead of only where source I/O dominates.
  * Note the sharing is real only because the batch is materialized once
  * (prepare()'s localCheckpoint): each action on a raw foreachBatch frame
  * re-reads the source files.
  *
  * Stage semantics per micro-batch:
  *  1. view projection/filter of the raw batch (VIEW)
  *  2. XREF upsert: the batch appends as a delta segment of the LSM
  *     [[SnapshotStore]]; merge-on-read resolves latest-by-key (A2/T2;
  *     Flink state TTL maps to snapshot retention). Per-batch write cost
  *     is O(|batch|) + amortized compaction, never O(snapshot).
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
  * (the GenStore batchId-idempotence discipline; VERDICT r9 #2), and the
  * snapshot append itself is batchId-keyed and replay-idempotent. Readers
  * `spark.read.parquet(dir)` the sink root and see `batch` as a provenance
  * partition column.
  */
object StreamingPipeline {

  final case class XrefConfig(
      keys: Seq[String],
      orderCols: Seq[String])

  /** The second argument the enrich/quarantine callbacks receive: the
    * post-merge snapshot rows for THE CURRENT BATCH'S KEYS ONLY — the
    * upsert-changelog delta, NOT the full snapshot. A distinct type so a
    * lambda written against full-snapshot semantics (e.g. one that
    * consults rows for keys outside the batch) fails to compile instead of
    * silently producing reduced output (ADVICE r10 #2 — the r10 delta
    * rework changed this argument's meaning without a type-level signal). */
  final case class UpsertDelta(rows: DataFrame)

  /** Keys-per-batch ceiling for broadcasting the delta semi-join's key set.
    * The batch key set is batch-sized at steady state, but the FIRST
    * AvailableNow micro-batch of a backfill can be the entire source — an
    * oversized broadcast fails the whole streaming query, where a shuffled
    * semi-join merely degrades (ADVICE r10 #1). 1M keys ≈ tens of MB
    * broadcast — safely under driver/executor headroom at default configs. */
  private val MaxBroadcastKeys = 1000000L

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
      enrich: (DataFrame, UpsertDelta) => DataFrame,
      quarantine: (DataFrame, UpsertDelta) => DataFrame,
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
      enrich: (DataFrame, UpsertDelta) => DataFrame,
      quarantine: (DataFrame, UpsertDelta) => DataFrame,
      batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // The view batch feeds three sinks AND the merge: prepare() bucket-tags
    // and localCheckpoints it ONCE (merge would otherwise re-materialize);
    // vb is a free narrow projection dropping the bucket tag.
    val prep = store.prepare(view(batch), xref.keys)
    val vb = prep.df.drop(store.bucketCol)
    // 2. incremental upsert: the batch appends as one batchId-keyed delta
    //    segment (O(|batch|) write; replay-idempotent). An all-filtered
    //    first batch leaves no snapshot on disk yet — downstream stages
    //    then join against an empty frame.
    val touched = store.mergePrepared(prep, xref.keys, xref.orderCols, Some(batchId))
    // 3. upsert delta: post-merge snapshot rows for THIS batch's keys —
    //    file-pruned to the touched buckets, key-semi-joined BEFORE the
    //    merge-on-read dedup (see readBuckets' preFilter contract).
    //    The key set is broadcast only under a count ceiling: steady-state
    //    batches are small (and checkpoint-RDD size estimates too fragile
    //    to trust for the hint), but a backfill's first batch can be the
    //    whole source — past the ceiling the join falls back to a shuffle
    //    instead of failing the query on an oversized broadcast.
    import org.apache.spark.sql.functions.{broadcast, col}
    // localCheckpoint: the distinct is computed once for the count AND
    // the join instead of re-shuffling inside each
    lazy val batchKeys =
      vb.select(xref.keys.map(col): _*).distinct().localCheckpoint()
    val delta = UpsertDelta(store.readBuckets(spark, touched, preFilter = { raw =>
        // key semi-join BEFORE the merge-on-read latest-by-key (it commutes
        // with per-key dedup): the agg then runs over just this batch's
        // keys' rows instead of every row in the touched buckets — at scale
        // the difference between aggregating a bucket and a batch.
        val keySide =
          if (batchKeys.count() <= MaxBroadcastKeys) broadcast(batchKeys)
          else batchKeys
        raw.join(keySide, xref.keys, "left_semi")
      })
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], vb.schema)))
    // 3+4. statement-set fan-out from the shared batch scan, idempotent
    //      per batchId: a retry overwrites its own directory. The sink
    //      writes run CONCURRENTLY (actions from separate threads share the
    //      scheduler): both read the same cached batch + delta plans, so
    //      serializing them only serializes sink I/O — the overlap is what
    //      the StmtSetAbProbe A/B showed independent queries winning at toy
    //      scale. The second action runs on a thread SPAWNED HERE, not a
    //      shared pool: a child thread inherits the micro-batch thread's
    //      InheritableThreadLocals (active session, job group) at creation,
    //      deterministically — so query.stop()'s cancelJobGroup still kills
    //      BOTH sink jobs, and user callbacks see the same thread-local
    //      Spark context they did when the writes were sequential. join()
    //      is interruptible, so stop() doesn't hang behind a stuck sink.
    //      Either side's failure fails the whole micro-batch (retry
    //      semantics unchanged); if both fail, the enrich error is primary
    //      and the quarantine error rides along as suppressed.
    val enrichErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread(() =>
      try writeIdempotent(enrich(vb, delta), s"$workDir/fgac_out", batchId)
      catch { case e: Throwable => enrichErr.set(e) },
      s"graft-sink-enrich-b$batchId")
    t.start()
    val quarErr =
      try { writeIdempotent(quarantine(vb, delta), s"$workDir/quarantine_out", batchId); null }
      catch { case e: Throwable => e }
    t.join()
    (enrichErr.get, quarErr) match {
      case (null, null) =>
      case (e, null) => throw e
      case (null, q) => throw q
      case (e, q) => e.addSuppressed(q); throw e
    }
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

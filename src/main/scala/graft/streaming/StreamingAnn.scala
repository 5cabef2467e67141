package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.AnnIndexStore

/** Online ANN serving — the streaming leg of the maintained IVF-PQ index
  * ([[graft.operators.AnnIndexStore]]): a live feed of query vectors is
  * answered per micro-batch FROM THE STORED INDEX (codebooks trained once
  * offline, serving never retrains) and the answers append to a result
  * log. This completes the batch/stream twin set — ingest dedup
  * ([[StreamingDedup]]), sessionization, anomaly flags, the interval join
  * — with the retrieval surface: the same stored artifact answers both
  * the one-shot batch sweep (q_ann_stored) and the live query feed.
  *
  * Scale shape per micro-batch: coarse/PQ centroids are manifest-scale
  * collects, the batch's probe set and LUTs broadcast, and candidate
  * restriction is one equi-join of the stored cells table against the
  * broadcast probes — cost tracks the BATCH (queries x probed cells),
  * never the corpus. Index maintenance stays a separate writer's job
  * (`AnnIndexStore.append` per accepted ingest batch); readers see the
  * store grow between micro-batches, exactly like the dedup gate.
  */
object StreamingAnn {

  /** Answer one micro-batch of query vectors from the stored index — the
    * `foreachBatch` body (and deliberately just a name for
    * [[AnnIndexStore.query]]: per-query answers do not depend on how the
    * feed is batched, which is what makes replay == batch provable). */
  def answerBatch(batch: DataFrame, idCol: String, vecCol: String,
                  indexDir: String, kNN: Int = 3, nProbe: Int = 2,
                  refine: Int = 0): DataFrame =
    AnnIndexStore.query(batch, idCol, vecCol, indexDir, kNN, nProbe, refine)

  /** Drive a streaming feed of query vectors against the stored index,
    * writing each micro-batch's (qid, rank, nid, dist) answers under
    * `outDir` as parquet. Because the index is static per micro-batch and
    * answers are per-query independent, the answer log over any batching
    * of the feed equals the one-shot batch answer over the union of the
    * batches — [[graft.StreamingAnnSpec]] pins this bit-for-bit.
    *
    * Delivery: EFFECTIVELY EXACTLY ONCE. Each micro-batch writes to its
    * own batchId-keyed subdirectory (`<outDir>/batch=<id>`) in overwrite
    * mode, so a micro-batch retried after a sink-side crash replaces its
    * own half-written output instead of double-appending rows — the
    * standard idempotent-foreachBatch discipline; the batchId is stable
    * across retries because it comes from the streaming checkpoint. Read
    * the log with [[answers]] (plain `spark.read.parquet(outDir)` also
    * works — the partition-style dir name surfaces as an extra `batch`
    * column, which answers() drops).
    *
    * MIGRATION: an `outDir` written by the pre-batchId flat layout cannot
    * be resumed in place — Spark's partition discovery rejects a root
    * that mixes bare part files with `batch=` subdirectories
    * (CONFLICTING_DIRECTORY_STRUCTURES). Point an upgraded stream at a
    * fresh outDir (or move the old files into a `batch=-1` subdir once);
    * the checkpoint dir needs no migration. */
  def serveStream(queryStream: DataFrame, idCol: String, vecCol: String,
                  indexDir: String, outDir: String, checkpointDir: String,
                  kNN: Int = 3, nProbe: Int = 2, refine: Int = 0,
                  trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        answerBatch(batch, idCol, vecCol, indexDir, kNN, nProbe, refine)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()

  /** The served answer log (qid, rank, nid, dist/adist) across all
    * micro-batches, with the batchId partition column dropped. */
  def answers(spark: org.apache.spark.sql.SparkSession,
              outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch")

  /** kNN-vote labeling of a streaming vector feed from the stored index
    * ([[AnnIndexStore.knnClassify]]) — the online leg of semi-supervised
    * label propagation: per micro-batch, each vector takes the majority
    * vote of its k nearest STORED neighbors, and the (qid, pred_label,
    * votes) verdicts land under batchId-keyed subdirectories (the
    * [[serveStream]] effectively-exactly-once discipline; read with
    * [[answers]]). Votes are per-query independent and the index static
    * per batch, so any batching of the feed reproduces the one-shot
    * batch labeling — [[graft.StreamingAnnSpec]] pins this bit-for-bit.
    * The label registry at `labelsPath` is re-read per micro-batch (a
    * registry-scale parquet read), so corrections and growth land on
    * the next batch without a stream restart (the
    * [[StreamingClassify]] weight-refresh discipline). */
  def labelStream(vecStream: DataFrame, idCol: String, vecCol: String,
                  indexDir: String, labelsPath: String, labelIdCol: String,
                  labelCol: String, outDir: String, checkpointDir: String,
                  k: Int = 5, nProbe: Int = 2, refine: Int = 30,
                  trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        AnnIndexStore.knnClassify(batch, idCol, vecCol, indexDir,
            batch.sparkSession.read.parquet(labelsPath), labelIdCol,
            labelCol, k, nProbe, refine)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()

  /** Embedding near-dup ingest gate, maintenance-closed — the vector twin
    * of [[StreamingDedup.gateAndMaintainPairs]]: per micro-batch, match
    * the batch against the stored IVF-PQ index
    * ([[AnnIndexStore.matchBatchVectors]]), drop every vector whose
    * nearest stored neighbor sits within the semantic-dup radius
    * `dupFloor`, and append the survivors to the index (coded with the
    * STORED codebooks — never retrained) so the next micro-batch screens
    * against them too. Returns the surviving rows for the caller's sink.
    * [[graft.StreamingAnnSpec]] asserts streamed micro-batches accept
    * exactly the batch-mode sequential survivors and that a copy of an
    * accepted vector is rejected by a later batch.
    *
    * Delivery: pass the foreachBatch `batchId` to make the loop
    * EFFECTIVELY EXACTLY ONCE under micro-batch retries. The index append
    * is an atomic batchId-keyed segment ([[AnnIndexStore.append]]), and a
    * retried batch whose append already committed returns its recorded
    * survivor set from the segment instead of re-matching — a re-match
    * would find every survivor already IN the store and gate them all out,
    * permanently losing the batch from the caller's sink (the round-8
    * review's retry hazard). Without a batchId the append still lands
    * atomically but a retry double-applies under a fresh segment name —
    * batch-mode callers that never retry may omit it. */
  def gateAndMaintainVectors(indexDir: String, batch: DataFrame,
                             idCol: String, vecCol: String, dupFloor: Long,
                             nProbe: Int = 6, refine: Int = 100,
                             batchId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    batchId.filter(AnnIndexStore.batchApplied(indexDir, _)) match {
      case Some(b) =>
        // retried, fully-applied batch: reproduce the committed survivors
        batch.join(
          AnnIndexStore.batchVecIds(batch.sparkSession, indexDir, b)
            .select(col("id").cast("long").as(idCol)),
          Seq(idCol), "left_semi")
      case None =>
        val verdict = AnnIndexStore.matchBatchVectors(batch, idCol, vecCol,
          indexDir, dupFloor, nProbe, refine)
        // localCheckpoint: survivors feed both the index append and the
        // caller's sink; without it the match would re-run per consumer.
        val survivors = batch.join(
            verdict.filter(!col("is_dup"))
              .select(col("new_id").cast("long").as(idCol)),
            Seq(idCol), "left_semi")
          .localCheckpoint()
        if (!survivors.isEmpty)
          AnnIndexStore.append(survivors, idCol, vecCol, indexDir, batchId)
        survivors
    }
  }
}

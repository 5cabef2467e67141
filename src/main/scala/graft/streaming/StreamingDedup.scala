package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact dedup at stream-ingest time — the first stage of a training-data
  * pipeline consuming an at-least-once source (Kafka redeliveries, connector
  * retries): drop records whose key was already seen, holding state only
  * for the watermark horizon.
  *
  * Thin, deliberate wrapper over Structured Streaming's
  * `dropDuplicatesWithinWatermark`: the watermark bounds the dedup state —
  * a key is remembered for `delay` of EVENT time and then evicted, so state
  * size tracks the duplicate-arrival horizon, not the stream's lifetime key
  * cardinality (the property that keeps this viable at 100 TB/day; an
  * unbounded `dropDuplicates` would grow state forever). Duplicates farther
  * apart than `delay` are NOT collapsed — that is the documented contract,
  * and the batch exact-dedup operator (q_dedup_exact) is the full-corpus
  * complement. */
object StreamingDedup {

  /** @param ds           streaming DataFrame
    * @param keyCols      duplicate identity (e.g. event_id, or a content
    *                     fingerprint from TextDedup.stableHash)
    * @param eventTimeCol event-time column the watermark rides on
    * @param delay        watermark delay, e.g. "10 minutes" — the dedup
    *                     memory horizon */
  def dedupStream(ds: DataFrame, keyCols: Seq[String],
                  eventTimeCol: String, delay: String): DataFrame =
    ds.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** NEAR-dup gate for stream ingestion, the micro-batch twin of
    * TextDedup.incrementalDedup: inside `foreachBatch`, match the batch
    * against the STATIC existing-corpus index and pass through only rows
    * whose text does not near-duplicate it (trigram Jaccard below
    * `minJaccard`). Per batch the cost is one signature pass over the
    * BATCH plus the cross-side band equi-join — the existing side's index
    * is production-precomputed and never self-joined. Exact-key dedup
    * within the stream itself stays [[dedupStream]]'s job; this gate
    * screens against the accumulated corpus. */
  def nearDupGate(existing: DataFrame, batch: DataFrame, idCol: String,
                  textCol: String, minJaccard: Double = 0.6): DataFrame =
    keep(batch, idCol, graft.operators.TextDedup
      .incrementalDedup(existing, batch, idCol, textCol, minJaccard))

  /** Index-backed gate — the production shape: the existing corpus
    * contributes its STORED [[graft.operators.DedupIndex]] (built once,
    * appended per accepted batch), so each micro-batch pays one signature
    * pass over the batch plus touched-bucket joins against the store —
    * never a corpus rehash. Maintain the index by calling
    * `DedupIndex.append` with each batch's survivors after it commits. */
  def nearDupGate(indexDir: String, batch: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    keep(batch, idCol, graft.operators.DedupIndex
      .matchBatch(batch, idCol, textCol, indexDir))

  /** The maintenance-closed form of the index-backed gate — the full
    * production ingest loop in one foreachBatch body: match the micro-
    * batch against a [[graft.operators.PairStore]]'s embedded index ONCE
    * (all verified cross pairs), drop every doc with a stored match, then
    * grow the store with the survivors — their internal self-join edges
    * plus the index append ([[graft.operators.PairStore.appendGated]];
    * the survivors' cross edges are provably empty because the same match
    * result that would produce them is what disqualified their docs).
    * After N micro-batches the store equals the batch-mode sequential
    * composition gate-then-append exactly — [[graft.PairStoreSpec]]
    * asserts the stored graph and survivor sets bit-identical. Returns
    * the surviving rows (already appended; the caller sinks them). */
  def gateAndMaintainPairs(storeDir: String, batch: DataFrame, idCol: String,
                           textCol: String, minJaccard: Double = 0.6,
                           batchId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    batchId.filter(graft.operators.PairStore.batchApplied(storeDir, _)) match {
      case Some(b) =>
        // Retried, fully-applied batch (the embedded index commits last,
        // so its batch segment proves both appends landed): reproduce the
        // committed survivor set from the segment instead of re-matching —
        // a re-match against a store that now CONTAINS the batch would
        // gate every survivor out and permanently lose the batch from the
        // caller's sink. Pass the foreachBatch batchId to get this
        // effectively-exactly-once behavior; a crash BETWEEN the two
        // appends recomputes below against an index that does not yet
        // contain the batch (same verdicts) and each append skips or
        // completes idempotently by its batch segment.
        batch.join(
          graft.operators.PairStore
            .batchDocIds(batch.sparkSession, storeDir, b, idCol),
          Seq(idCol), "left_semi")
      case None =>
        // Gate at the STORE's recorded mining floor, not the caller's
        // argument: appendGated banks on "no stored match at or above the
        // floor", so matching any higher would permanently lose every
        // cross edge in [floor, minJaccard) (ADVICE r08). The caller's
        // value remains the legacy-store fallback and is cross-checked
        // against the recorded floor exactly as in PairStore.append.
        val thr = graft.operators.PairStore.gateThreshold(storeDir, minJaccard)
        val cross = graft.operators.DedupIndex.matchBatchPairs(
          batch, idCol, textCol, s"$storeDir/index", thr)
        // localCheckpoint: survivors feed both the append below and the
        // caller's sink; without it the match (and its pruned store reads)
        // would re-run per consumer.
        val survivors = batch.join(
            cross.select(col("new_id").as(idCol)).distinct(),
            Seq(idCol), "left_anti")
          .localCheckpoint()
        graft.operators.PairStore.appendGated(survivors, idCol, textCol,
          storeDir, minJaccard, batchId = batchId)
        survivors
    }
  }

  /** Novelty gate + maintenance in one foreachBatch body: score the
    * micro-batch against the stored [[graft.operators.NoveltyIndex]]
    * (fraction of each doc's n-grams the corpus has literally seen),
    * keep docs with `novelty_bp >= minNoveltyBp`, append the SURVIVORS'
    * grams so the next batch is screened against them too. With
    * `batchId` set the append is an atomic idempotent segment carrying
    * the survivor ids, and a retried batch reproduces its committed
    * survivor set instead of re-gating (which would score every survivor
    * 0 against a store that now contains it and drop the batch) — the
    * same effectively-exactly-once discipline as
    * [[gateAndMaintainPairs]]. Per-batch cost: one stored-gram scan +
    * batch-sized work ([[graft.operators.NoveltyIndex.noveltyBatch]]
    * scale notes). */
  def noveltyGateAndMaintain(indexDir: String, batch: DataFrame,
                             idCol: String, textCol: String,
                             minNoveltyBp: Long = 5000L,
                             batchId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    batchId.filter(graft.operators.NoveltyIndex.batchApplied(indexDir, _)) match {
      case Some(b) =>
        batch.join(
          graft.operators.NoveltyIndex
            .batchDocIds(batch.sparkSession, indexDir, b, idCol),
          Seq(idCol), "left_semi")
      case None =>
        val verdict = graft.operators.NoveltyIndex
          .noveltyBatch(batch, idCol, textCol, indexDir)
        val survivors = batch.join(
            verdict.filter(col("novelty_bp") >= minNoveltyBp)
              .select(col(idCol)),
            Seq(idCol), "left_semi")
          .localCheckpoint()
        graft.operators.NoveltyIndex.appendGated(survivors, idCol, textCol,
          indexDir, batchId)
        survivors
    }
  }

  private def keep(batch: DataFrame, idCol: String,
                   verdict: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    batch.join(
      verdict.filter(!col("is_dup")).select(col("new_id").as(idCol)),
      Seq(idCol), "left_semi")
  }
}

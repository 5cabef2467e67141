package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming execution of the 3-stage pipeline: one source scan fanned out
  * to N sinks inside a single `foreachBatch` — the engine's equivalent of
  * Flink's EXECUTE STATEMENT SET (v22:397; SURVEY §2 T1/§4 "statement-set =
  * shared source scan"). Spark would otherwise run one independent scan per
  * `writeStream`; `foreachBatch` gives a shared scan and per-batch
  * atomic-ish multi-sink writes (at-least-once per sink, matching the
  * reference's delivery contract, SURVEY §7.5.2).
  *
  * Stage semantics per micro-batch:
  *  1. view projection/filter of the raw batch (VIEW)
  *  2. XREF upsert: latest-by-key over (current snapshot ∪ batch) ->
  *     [[SnapshotStore]] (A2/T2; Flink state TTL maps to snapshot retention)
  *  3. enrichment join of the *batch's* view rows against the refreshed
  *     snapshot — the stream-to-changelog join (J3) re-resolved per batch
  *  4. quarantine anti-join side output (S5/T6 dead-lettering)
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
    * @param enrich     (viewBatch, xrefSnapshot) => enriched output rows
    * @param quarantine (viewBatch, xrefSnapshot) => quarantined rows
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
        val spark = batch.sparkSession
        val v = view(batch)
        // localCheckpoint: the view batch feeds three sinks; materialize once
        val vb = v.localCheckpoint()
        // 2. incremental upsert merge: only snapshot buckets containing
        //    batch keys are read + rewritten (Delta-MERGE shape). An
        //    all-filtered first batch leaves no snapshot on disk yet —
        //    downstream stages then join against an empty frame.
        store.merge(vb, xref.keys, xref.orderCols)
        val snap = store.read(spark)
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], vb.schema))
        // 3+4. statement-set fan-out from the shared batch scan
        enrich(vb, snap).write.mode(SaveMode.Append)
          .parquet(s"$workDir/fgac_out")
        quarantine(vb, snap).write.mode(SaveMode.Append)
          .parquet(s"$workDir/quarantine_out")
        ()
      }
      .start()
  }
}

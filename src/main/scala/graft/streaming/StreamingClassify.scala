package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Classify

/** Trained-filter ingest gate — the streaming leg of the seed-trained
  * linear classifier ([[graft.operators.Classify]]): each micro-batch is
  * scored against the STORED weight table (trained once offline on the
  * labeled seed, serving never retrains) and only positive-score rows
  * pass. This is the online form of the CCNet/fastText quality-filter
  * stage, completing the batch/stream twin set alongside the dedup,
  * novelty, and vector gates ([[StreamingDedup]], [[StreamingAnn]]).
  *
  * Scale shape per micro-batch: one explode of the BATCH plus a
  * broadcast join of the <= vocabSize weight table — no state store, no
  * corpus-side scan, nothing keyed by the stream's lifetime. Because
  * scores are per-document independent and the weights are static per
  * batch, any batching of the feed passes exactly the rows the one-shot
  * batch filter keeps — [[graft.StreamingClassifySpec]] pins this
  * bit-for-bit. Weight refresh: the artifact is re-read per micro-batch
  * (a one-file parquet read), so retraining via
  * [[graft.operators.Classify.saveWeights]] takes effect on the next
  * batch without restarting the stream.
  */
object StreamingClassify {

  /** foreachBatch body: the micro-batch rows the trained filter keeps
    * (classifier score > 0; docs with no in-vocabulary tokens score 0
    * and drop). */
  def gateBatch(batch: DataFrame, idCol: String, textCol: String,
                weights: DataFrame): DataFrame =
    batch.join(
      Classify.scoreLinear(batch, idCol, textCol, weights)
        .filter(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** [[gateBatch]] against a stored weight artifact. */
  def gateBatch(batch: DataFrame, idCol: String, textCol: String,
                weightsDir: String): DataFrame =
    gateBatch(batch, idCol, textCol,
      Classify.loadWeights(batch.sparkSession, weightsDir))

  /** Drive a streaming document feed through the trained filter, writing
    * each micro-batch's surviving rows under `outDir` as parquet.
    *
    * Delivery: EFFECTIVELY EXACTLY ONCE — each micro-batch overwrites its
    * own batchId-keyed subdirectory (`<outDir>/batch=<id>`), so a retry
    * after a sink-side crash replaces its half-written output instead of
    * double-appending (the [[StreamingAnn.serveStream]] discipline; the
    * batchId is stable across retries because it comes from the
    * streaming checkpoint). Read the kept log with [[kept]]. */
  def filterStream(docStream: DataFrame, idCol: String, textCol: String,
                   weightsDir: String, outDir: String, checkpointDir: String,
                   trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, idCol, textCol, weightsDir)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()

  /** The kept-document log across all micro-batches, with the batchId
    * partition column dropped. */
  def kept(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization over an event stream — the batch twin of
  * the streaming session assembly a log/clickstream pipeline needs before
  * events can feed training-data curation (reference anchor: the events
  * topic the STTM pipelines consume, resources/sql/xref-queries.sql's
  * keyed-stream shape).
  *
  * A new session starts at the first event of a key and at any event whose
  * gap from the previous event of the same key exceeds `gapSeconds`.
  *
  * Scale: every window is partitioned by the key column — the shuffle is
  * one hash exchange on the key, each partition sorts only its own keys'
  * events, and no global ordering exists anywhere. Timestamps are compared
  * as integer microseconds (`unix_micros`) so the session boundaries are
  * exact and engine-portable.
  */
object Sessionize {

  /** Input rows + (`ts_us`, `session_idx`) where `session_idx` is the
    * 1-based session ordinal within the key. `tieCol` must make the
    * per-key ordering total (a unique event id). */
  def assignSessions(events: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us"), col(tieCol))
    val cum = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("_prev_us", lag("ts_us", 1).over(order))
      .withColumn("_new", when(col("_prev_us").isNull ||
        col("ts_us") - col("_prev_us") > gapSeconds * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("session_idx", sum("_new").over(cum))
      .drop("_prev_us", "_new")
  }

  /** One row per (key, session): event count, first/last event time
    * (integer microseconds) and duration. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, gapSeconds: Long): DataFrame =
    assignSessions(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}

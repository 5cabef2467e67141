package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the live-ingest twin of
  * [[graft.operators.RangeJoin.withinWindowPairs]].
  *
  * Batch range joins band timestamps into buckets to dodge the nested
  * loop; a LIVE feed can instead lean on Structured Streaming's native
  * stream-stream join: with a watermark on both sides and a time-range
  * predicate bounding how far the two event times may drift, Spark keeps
  * only the trailing `delay + window` of each side in the state store and
  * evicts everything older — per-key state is bounded by event rate times
  * the window, independent of stream length. This is the correlation
  * engine for live sessions ("purchases within 2h of a click by the same
  * user"), fraud windows, and the streaming leg of the enrichment joins
  * the batch surface runs as banded equi-joins.
  *
  * Scale shape: the join is a keyed symmetric hash join over watermark-
  * bounded state — one exchange per side on the join key, state eviction
  * driven by the watermark, no unbounded buffering. The append-mode
  * output emits each qualifying pair exactly once.
  *
  * Semantics match the batch operator exactly (ordered pairs, strictly
  * later second element, equal timestamps ordered by id), which
  * [[graft.StreamingRangeJoinSpec]] pins by replaying the event table in
  * micro-batches and comparing against `withinWindowPairs`' pair set
  * bit-for-bit.
  */
object StreamingRangeJoin {

  /** Ordered within-`windowSec` pairs of events sharing `keyCol`, as a
    * streaming append-mode join. `events` must be a streaming DataFrame
    * with a TimestampType `tsCol`; `delaySec` is the late-data allowance
    * (events later than that past the max seen timestamp may be dropped
    * by watermarking, exactly like every other watermarked surface here).
    * Output: k, id1, ts1, id2, ts2 — the batch operator's schema with
    * timestamps in place of numeric ticks. */
  def withinWindowPairsStream(events: DataFrame, keyCol: String,
                              tsCol: String, idCol: String,
                              windowSec: Long, delaySec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    require(delaySec >= 0, "delaySec must be >= 0")
    val early = events
      .select(col(keyCol).as("k"), col(tsCol).as("ts1"), col(idCol).as("id1"))
      .withWatermark("ts1", s"$delaySec seconds")
    val late = events
      .select(col(keyCol).as("_k2"), col(tsCol).as("ts2"), col(idCol).as("id2"))
      .withWatermark("ts2", s"$delaySec seconds")
    early.join(late,
        col("k") === col("_k2") &&
          col("ts2") >= col("ts1") &&
          col("ts2") <= col("ts1") + expr(s"INTERVAL $windowSec SECONDS") &&
          // given ts2 >= ts1 this is: ts1 < ts2 OR (ts1 = ts2 AND id1 < id2)
          (col("ts1") < col("ts2") || col("id1") < col("id2")))
      .select(col("k"), col("id1"), col("ts1"), col("id2"), col("ts2"))
  }
}

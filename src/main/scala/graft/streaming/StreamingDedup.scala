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
}

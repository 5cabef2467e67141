package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental keyed-upsert XREF as true streaming state: one state entry
  * per key holding the current latest record, emitting an update whenever a
  * newer record (by the (ts, seq) ordering) arrives — the direct Spark
  * equivalent of Flink's PRIMARY KEY + changelog.mode=upsert table
  * (xref-queries.sql:13-23), complementing the snapshot-store formulation in
  * [[StreamingPipeline]] (which favors restartability and cheap full scans;
  * this one favors low-latency per-key updates).
  *
  * State TTL (the reference's `sql.state.ttl` hints, xref-queries.sql:69-90)
  * maps to `GroupStateTimeout.ProcessingTimeTimeout`: keys idle longer than
  * `ttlMs` are evicted — at 100 TB key cardinality this is what bounds the
  * state store.
  */
object StatefulXref {

  /** Update-mode changelog of latest-record-per-key.
    *
    * @param ds    input stream of records
    * @param key   key extractor (the XREF primary key)
    * @param order (eventTimeMicros, seq) ranking — larger wins
    * @param ttlMs optional per-key state TTL in processing time
    */
  def latestByKeyStream[K, V](ds: Dataset[V], key: V => K, order: V => (Long, Long),
                              ttlMs: Option[Long] = None)(
      implicit ke: Encoder[K], ve: Encoder[V]): Dataset[V] = {
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key)
      .flatMapGroupsWithState[V, V](OutputMode.Update(), timeout) {
        (_: K, rows: Iterator[V], state: GroupState[V]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val incoming = rows.toSeq
            if (incoming.isEmpty) Iterator.empty
            else {
              val bestIncoming = incoming.maxBy(order)
              val current = state.getOption
              val changed = current.forall(c => Ordering[(Long, Long)]
                .lt(order(c), order(bestIncoming)))
              if (changed) {
                state.update(bestIncoming)
                ttlMs.foreach(state.setTimeoutDuration)
                Iterator.single(bestIncoming)
              } else {
                ttlMs.foreach(state.setTimeoutDuration)
                Iterator.empty
              }
            }
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessionize]]: per-key session
  * assembly as true incremental state, one open session per key.
  *
  * A session CLOSES (and is emitted) when a later event of the same key
  * arrives more than `gapSeconds` after the session's last event — the
  * same gap rule as the batch operator, so replaying a bounded stream
  * through this sessionizer yields exactly the batch `sessionStats` rows
  * for every session that has a successor (asserted in
  * StatefulSessionizerSpec). With `idleFlushMs` set, a key idle that long
  * in PROCESSING time also flushes its open session and drops the state
  * entry — the same TTL mechanism as [[StatefulXref]], and what bounds
  * state size at 100 TB key cardinality.
  *
  * Ordering contract: events of one key must not arrive across
  * micro-batches out of event-time order (within a batch any order is
  * fine — the handler sorts). That is the standard contract a watermarked
  * upstream gives a stateful operator.
  */
object StatefulSessionizer {

  /** (key, event-time micros, tie-break id) input row. */
  case class SEvent(key: Long, ts_us: Long, event_id: Long)

  /** Closed-session output row — same shape as the batch
    * `Sessionize.sessionStats`. */
  case class SSession(key: Long, session_idx: Long, n_events: Long,
                      start_us: Long, end_us: Long, duration_us: Long)

  /** Open-session state: (session ordinal, start, end, event count). */
  private type OpenSession = (Long, Long, Long, Long)

  def sessionizeStream(ds: Dataset[SEvent], gapSeconds: Long,
                       idleFlushMs: Option[Long] = None): Dataset[SSession] = {
    import ds.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    val timeout =
      if (idleFlushMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, SSession](OutputMode.Append(), timeout) {
        (key: Long, rows: Iterator[SEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val (idx, start, end, n) = state.get
            state.remove()
            Iterator.single(SSession(key, idx, n, start, end, end - start))
          } else {
            val evs = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
            if (evs.isEmpty) Iterator.empty
            else {
              val closed = scala.collection.mutable.ListBuffer.empty[SSession]
              var (idx, start, end, n) =
                state.getOption.getOrElse((0L, 0L, 0L, 0L))
              evs.foreach { e =>
                if (n == 0L) {
                  idx += 1; start = e.ts_us; end = e.ts_us; n = 1L
                } else if (e.ts_us - end > gapUs) {
                  closed += SSession(key, idx, n, start, end, end - start)
                  idx += 1; start = e.ts_us; end = e.ts_us; n = 1L
                } else {
                  end = e.ts_us; n += 1L
                }
              }
              state.update((idx, start, end, n))
              idleFlushMs.foreach(state.setTimeoutDuration)
              closed.iterator
            }
          }
      }
  }
}

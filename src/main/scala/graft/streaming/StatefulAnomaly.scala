package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Anomaly]]: the rolling z-score
  * outlier test as true incremental per-key state — the live ingest
  * guardrail (flag a source whose metric leaves its own recent
  * distribution DURING ingestion, not in the nightly batch).
  *
  * State per key is the trailing `n`-value ring (O(n) longs, bounded
  * however many keys or events arrive), and the flag algebra is the
  * batch operator's exact integer form — (n·x − S)² > k²·(n·Q − S²)
  * over fixed-point cents — so a bounded stream replayed through this
  * operator yields BIT-IDENTICAL flags to `Anomaly.rollingZ`
  * (StatefulAnomalySpec asserts streamed == batch at sf scale).
  *
  * Ordering contract: same as [[StatefulSessionizer]] — per-key
  * event-time order across micro-batches (in-batch disorder is sorted
  * out), the contract a watermarked upstream provides.
  */
object StatefulAnomaly {

  /** (key, event-time micros, tie-break id, fixed-point cents) input. */
  case class AEvent(key: Long, ts_us: Long, event_id: Long, cents: Long)

  /** Flag row — same shape as the batch `Anomaly.rollingZ` output. */
  case class AFlag(key: Long, ts_us: Long, cents: Long, win_n: Long,
                   flag: Boolean)

  def detectStream(ds: Dataset[AEvent], n: Int = 20, k2: Int = 9)
  : Dataset[AFlag] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[List[Long], AFlag](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[AEvent], state: GroupState[List[Long]]) =>
          val evs = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var ring = state.getOption.getOrElse(Nil) // oldest first, <= n
          val out = evs.map { e =>
            ring = (ring :+ e.cents).takeRight(n)
            val wn = ring.length.toLong
            val s = ring.sum
            val q = ring.map(c => c * c).sum
            val lhs = (wn * e.cents - s) * (wn * e.cents - s)
            val flag = wn == n.toLong && lhs > k2.toLong * (wn * q - s * s)
            AFlag(key, e.ts_us, e.cents, wn, flag)
          }
          state.update(ring)
          out.iterator
      }
  }
}

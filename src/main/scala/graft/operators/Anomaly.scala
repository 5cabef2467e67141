package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score outlier detection over a keyed event stream — the
  * telemetry-guardrail shape (flag a user/source whose metric suddenly
  * leaves its own recent distribution, e.g. a poisoned source whose
  * quality crashes mid-ingest).
  *
  * The usual rolling mean/stddev is float arithmetic whose result depends
  * on summation order — not reproducible across engines or even runs. So
  * the z-test is restated in exact integer algebra over fixed-point cents:
  * with window sum S, sum-of-squares Q and width n,
  *
  *   |z| > k  ⟺  (n·x − S)² > k²·(n·Q − S²)
  *
  * — every side a 64-bit integer, so the flag (and the oracle hash) is
  * bit-identical everywhere. Headroom: |cents| < ~3·10⁶ keeps the squared
  * terms under 2⁶³ at n ≤ 64.
  *
  * Scale shape: ONE hash exchange on the key; the rolling frame is a
  * bounded ROWS window per key (never a global or growing frame), so
  * state per task is O(n). Rows before a full window are never flagged
  * (the test needs n samples). */
object Anomaly {

  /** Returns (key, ts_us, cents, win_n, flag) for every event, ordered
    * evaluation per key by (ts, tie). `k2` is k² (k=3 → 9). */
  def rollingZ(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, valCol: String,
               n: Int = 20, k2: Int = 9): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us"), col(tieCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("ts_us"), col(tieCol),
        floor(col(valCol) * 100).cast("long").as("cents"))
      .withColumn("s", sum("cents").over(w))
      .withColumn("q", sum(col("cents") * col("cents")).over(w))
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("flag",
        col("win_n") === n &&
          (col("win_n") * col("cents") - col("s")) *
            (col("win_n") * col("cents") - col("s")) >
            lit(k2.toLong) * (col("win_n") * col("q") - col("s") * col("s")))
      .select(col(keyCol), col("ts_us"), col("cents"), col("win_n"),
        col("flag"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction: collapse a
  * keyed change stream into validity intervals — one row per run of
  * consecutive equal values, carrying [valid_from, valid_to) with the
  * current run open-ended (NULL valid_to). The temporal-table shape every
  * warehouse derives from CDC feeds, and the complement of the engine's
  * latest-by-key XREF surface (A1 keeps the newest row; this keeps the
  * full lineage queryable as of any instant).
  *
  * Scale shape: ONE hash exchange on the key; both windows (change flag
  * via lag, interval close via lead) and the run-id running sum reuse the
  * same per-key ordering — Spark plans a single sort, no global window,
  * no self-join against the history. Ties on ts are broken by `tieCol`
  * so replayed/duplicated feeds produce identical intervals.
  */
object Scd {

  /** Build the SCD2 interval table from a change stream.
    * Returns (key, value, valid_from_us, valid_to_us NULL-when-current,
    * n_events — rows collapsed into the run). */
  def scd2History(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us"), col(tieCol))
    val runs = events
      .select(col(keyCol), unix_micros(col(tsCol)).as("ts_us"),
        col(tieCol), col(valCol).as("value"))
      .withColumn("chg",
        when(lag(col("value"), 1).over(ord).isNull ||
          lag(col("value"), 1).over(ord) =!= col("value"), 1L).otherwise(0L))
      .withColumn("run", sum("chg").over(
        Window.partitionBy(col(keyCol)).orderBy(col("ts_us"), col(tieCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs.groupBy(col(keyCol), col("run"), col("value"))
      .agg(min("ts_us").as("valid_from_us"), count(lit(1)).as("n_events"))
    val seq = Window.partitionBy(col(keyCol)).orderBy(col("valid_from_us"))
    intervals
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(seq))
      .select(col(keyCol), col("value"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"))
  }

  /** Point-in-time lookup over an SCD2 table: the value each key held at
    * `asOfUs` — a pure filter (valid_from <= t < valid_to, NULL open end),
    * no window, scan speed. */
  def asOf(history: DataFrame, asOfUs: Long): DataFrame =
    history.filter(col("valid_from_us") <= asOfUs &&
      (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing: compare two versions of a keyed table and
  * classify every key as added / removed / changed / unchanged — the
  * regression audit between pipeline runs ("what did the new filter
  * chain actually do?") and the input to incremental downstream refresh
  * (recompute only changed partitions).
  *
  * Scale shape: each side is reduced to (key, fingerprint) — a pure
  * projection, so the wide payload columns never shuffle — then ONE full
  * outer hash equi-join on the key decides the status. Fingerprints are
  * md5 over the concatenated compare columns (with a field separator no
  * payload contains), so "changed" is content-defined and
  * engine-mirrorable.
  */
object Diff {

  private def fp(cols: Seq[String]): Column =
    md5(concat_ws("\u0001", cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** Per-key diff: (key, status, old_fp, new_fp), fingerprints NULL on
    * the missing side. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(keyCol), fp(compareCols).as("old_fp"))
    val n = newDf.select(col(keyCol), fp(compareCols).as("new_fp"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Status roll-up: (status, n) — the one-screen regression report. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy("status").agg(count(lit(1)).as("n"))
}

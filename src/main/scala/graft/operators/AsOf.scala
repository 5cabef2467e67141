package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the LATEST right row of the same key
  * whose timestamp is <= the left row's (the time-series enrichment join —
  * "the quote in effect at trade time", "the last click before this
  * purchase").
  *
  * Spark has no native as-of join; the naive encodings are a range theta
  * join (nested-loop — quadratic per key) or a per-left-row subquery. This
  * is the UNION + ORDERED WINDOW form instead: tag both sides, sort each
  * key's merged timeline once, and carry the last-seen right row forward
  * with `last(_, ignoreNulls = true)` over the running frame. Cost is ONE
  * hash exchange on the key plus a per-key sort — the same plan shape as
  * sessionization, linear in |left| + |right|, no pairwise blowup, and
  * whole-stage-codegen-friendly (built-in window function, no UDF).
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (inclusive <=, the DuckDB/QuestDB ASOF convention — right rows sort
  * before left rows at equal timestamps). Right rows are first collapsed
  * to one per (key, ts) keeping the highest tie-break id, so ties inside
  * the right side are deterministic in any engine.
  */
object AsOf {

  /** Left columns pass through; the matched right row contributes
    * `rValCol` (null when no right row precedes the left row).
    *
    * @param left     probe side — (keyCol, tsCol, anything else)
    * @param right    reference side — (keyCol, tsCol, rIdCol, rValCol)
    * @param keyCol   equi-join key present on both sides
    * @param tsCol    ordering column (numeric or timestamp) on both sides
    * @param rIdCol   right tie-break id (unique within (key, ts))
    * @param rValCol  right payload column carried to the output
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rIdCol: String, rValCol: String): DataFrame = {
    val leftCols = left.columns
    // one right row per (key, ts): highest id wins, deterministically
    val r1 = right
      .groupBy(col(keyCol), col(tsCol))
      .agg(max_by(struct(col(rIdCol), col(rValCol)), col(rIdCol)).as("_r"))
      .select(col(keyCol), col(tsCol), col("_r")(rIdCol).as("_r_id"),
        col("_r")(rValCol).as("_r_val"))
    // The matched right row is carried forward as ONE struct, not two
    // parallel columns: the struct is non-null for every right row even
    // when the payload itself is null, so a null rValCol can never make
    // last(..., ignoreNulls) skip the value while keeping the id — the
    // matched (id, value) pair always comes from the SAME right row
    // (DuckDB ASOF semantics).
    val rowType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", r1.schema("_r_id").dataType),
      org.apache.spark.sql.types.StructField("v", r1.schema("_r_val").dataType)))
    val lTagged = left
      .withColumn("_rrow", lit(null).cast(rowType))
      .withColumn("_side", lit(1))
    val rTagged = r1
      .select((leftCols.map(c =>
          if (c == keyCol || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(col("_r_id").as("id"), col("_r_val").as("v")).as("_rrow"),
          lit(0).as("_side"))): _*)
    // right rows sort BEFORE left rows at equal ts -> inclusive match
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col("_m")("id").as(s"asof_$rIdCol")
        :+ col("_m")("v").as(s"asof_$rValCol"): _*)
  }
}

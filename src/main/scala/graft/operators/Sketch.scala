package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: frequency estimation in d·w counters regardless of
  * key cardinality (Cormode & Muthukrishnan 2005). Each occurrence
  * increments one counter per hash row; an estimate is the MINIMUM of a
  * key's d counters — never an underestimate, over by at most the
  * collision mass (≤ 2N/w with probability 1 − (1/2)^d).
  *
  * At 100 TB the sketch is THE way to track token/domain/URL frequencies:
  * the counter table is d·w rows however large the corpus, build is one
  * map-side-combinable aggregation over the occurrence stream, and two
  * sketches merge by cell-wise addition (associative — so per-partition,
  * per-day, or per-shard sketches roll up for free). Hashes are the
  * repo's 60-bit md5 parity form so a SQL engine mirrors every cell.
  */
object Sketch {

  private def bucket(r: Column, key: Column, w: Int,
                     oracleParity: Boolean): Column = {
    val h: Column => Column =
      if (oracleParity) TextDedup.stableHash else c => xxhash64(c)
    pmod(h(concat_ws("_", r, key)), lit(w.toLong))
  }

  /** Build the d×w counter table over a key-occurrence column (one input
    * row = one occurrence). Returns (r, b, c) — d·w rows at most, however
    * many occurrences went in. One aggregation, map-side partial. */
  def countMinBuild(occurrences: DataFrame, keyCol: String,
                    d: Int = 3, w: Int = 1024,
                    oracleParity: Boolean = true): DataFrame =
    occurrences
      .select(col(keyCol).as("k"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), bucket(col("r"), col("k"), w, oracleParity).as("b"))
      .agg(count(lit(1)).as("c"))

  /** Point-query the sketch for each distinct key in `keys`: the minimum
    * of its d counters. The sketch side is d·w rows — broadcast by
    * construction; the key side never shuffles more than one partial-agg
    * min. Returns (key, n_est). */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                       d: Int = 3, w: Int = 1024,
                       oracleParity: Boolean = true): DataFrame =
    keys.select(col(keyCol).as("k")).distinct()
      .select(col("k"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("b", bucket(col("r"), col("k"), w, oracleParity))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy(col("k").as(keyCol))
      .agg(min("c").as("n_est"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution) as a BLOCKED edit-distance
  * join: never the all-pairs levenshtein cross product.
  *
  * Pigeonhole blocking for maxDist = 1: any single edit (substitution,
  * insertion, deletion) leaves the first `blockLen` characters OR the
  * last `blockLen` characters of the string untouched (an edit at
  * position p < blockLen preserves the suffix block; one at
  * p ≥ blockLen preserves the prefix block — for strings longer than
  * 2·blockLen). So the exact candidate set is the UNION of two hash
  * equi-joins — prefix-block and suffix-block — verified by one
  * `levenshtein` per candidate. This is the 2-segment case of the
  * PassJoin discipline (Li et al. 2011: maxDist k needs k+1 segments);
  * the join stays an equi-join at any corpus size, and block skew is
  * bounded by the key distribution, not the corpus.
  *
  * levenshtein() is a codegen'd built-in in both Spark and DuckDB, so
  * the verify stage is oracle-mirrorable verbatim.
  */
object Fuzzy {

  /** Resolve each left (dirty) string to right (canonical) strings within
    * edit distance `maxDist` (currently 1 — the pigeonhole blocking above
    * is exact only for one edit). Returns (left id, right id, dist).
    * Strings shorter than 2·blockLen fall back to length-keyed blocks;
    * since one indel shifts the length by one, the right side emits keys
    * for lengths L−1, L, L+1 so cross-length matches still meet (exact,
    * still an equi-join; short-string blocks are small by nature). */
  def resolveByEdit(left: DataFrame, leftId: String, leftStr: String,
                    right: DataFrame, rightId: String, rightStr: String,
                    blockLen: Int = 4, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, "prefix/suffix pigeonhole blocking is exact for maxDist = 1 only")
    def blocks(df: DataFrame, id: String, s: String, side: String,
               lenKeys: Seq[Int]) = {
      // at length == 2*blockLen BOTH key families are emitted, so a
      // short/long pair straddling the boundary (lengths 2B-1 and 2B,
      // one indel apart) still meets in a length block
      val ps = when(length(col(s)) >= 2 * blockLen, array(
          concat(lit("p"), substring(col(s), 1, blockLen)),
          concat(lit("s"), substring(col(s), -blockLen, blockLen))))
        .otherwise(array().cast("array<string>"))
      val lk = when(length(col(s)) <= 2 * blockLen,
          array(lenKeys.map(d =>
            concat(lit("l"), (length(col(s)) + d).cast("string"))): _*))
        .otherwise(array().cast("array<string>"))
      df.select(col(id).as(s"${side}_id"), col(s).as(s"${side}_s"),
        explode(concat(ps, lk)).as("blk"))
    }
    val cand = blocks(left, leftId, leftStr, "l", Seq(0))
      .join(blocks(right, rightId, rightStr, "r", Seq(-1, 0, 1)), Seq("blk"))
      .select(col("l_id"), col("l_s"), col("r_id"), col("r_s"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("l_s"), col("r_s")))
      .filter(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("dist"))
  }
}

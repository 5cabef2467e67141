package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins without the nested loop.
  *
  * A predicate like `0 < t2 - t1 <= W` is a theta join: Spark's only
  * direct plan for it is a nested-loop — quadratic per key. The BANDING
  * rewrite turns it into an equi-join: bucket each timestamp by
  * `b = t div W`; any pair within W is either in the same bucket or in
  * adjacent ones, so joining on `(key, bucket)` with the earlier side
  * exploded to {its bucket, its bucket + 1} finds every qualifying pair
  * via hash equi-joins, then the exact window predicate filters the
  * false candidates inside the same stage. Candidate volume is bounded
  * by bucket co-residency (2x the within-2W pair count), not |left|x|right|.
  */
object RangeJoin {

  /** Ordered pairs of rows sharing `keyCol` whose `tsCol` values are
    * within `window` of each other (strictly later second element; equal
    * timestamps ordered by `idCol`). Output: key, id1, ts1, id2, ts2.
    *
    * Plan shape: one explode (x2 on the earlier side) + one hash
    * equi-join on (key, bucket) + an in-stage filter — no nested loop,
    * asserted in RangeJoinSpec.
    *
    * Hot-key guard: the equi-join key is (key, bucket), so a key that both
    * dominates the corpus AND concentrates in time lands each hot (key,
    * bucket) cell on ONE task. `nSalt > 1` composes the [[Skew]] salting
    * pattern into the band join — the later side gets a content-
    * independent salt, the earlier (exploded) side is replicated nSalt
    * ways, and the join key becomes (key, bucket, salt): the hot cell's
    * pair generation spreads over nSalt tasks at the cost of nSalt x the
    * earlier side's volume. Result-identical to the unsalted join (each
    * pair meets under exactly one salt). Leave nSalt = 1 when key
    * cardinality is healthy or AQE's runtime skew split is on.
    */
  def withinWindowPairs(df: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, window: Long,
                        nSalt: Int = 1): DataFrame = {
    require(window > 0, "window must be positive")
    require(nSalt > 0, "nSalt must be positive")
    val base = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(idCol).as("id"))
    // earlier side: a later event in bucket b matches earlier events in
    // buckets {b, b - 1}, i.e. the earlier event advertises {b, b + 1}
    val early0 = base.select(col("k"), col("ts").as("ts1"), col("id").as("id1"),
      explode(array(expr(s"ts div $window"), expr(s"ts div $window + 1")))
        .as("b"))
    val late0 = base.select(col("k"), col("ts").as("ts2"), col("id").as("id2"),
      expr(s"ts div $window").as("b"))
    val (early, late, joinKeys) =
      if (nSalt == 1) (early0, late0, Seq("k", "b"))
      else (
        early0.withColumn("_salt",
          explode(sequence(lit(0), lit(nSalt - 1)))),
        late0.withColumn("_salt",
          pmod(hash(monotonically_increasing_id()), lit(nSalt))),
        Seq("k", "b", "_salt"))
    early.join(late, joinKeys)
      .filter((col("ts1") < col("ts2") ||
          (col("ts1") === col("ts2") && col("id1") < col("id2"))) &&
        col("ts2") - col("ts1") <= window)
      .select(col("k"), col("id1"), col("ts1"), col("id2"), col("ts2"))
  }
}

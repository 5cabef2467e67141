package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins.
  *
  * When one join key carries a disproportionate share of the rows, the
  * hash-partitioned join sends that whole share to ONE task: the stage
  * runs at the speed of its hottest key. AQE's skew-join split handles
  * this for sort-merge joins it can see at runtime; `saltedJoin` is the
  * explicit, planner-independent form — use it where AQE cannot help
  * (aggregation-like fan-outs, joins hidden inside checkpointed stages)
  * or where the skew is known ahead of time.
  *
  * Mechanics: the probe side gets a uniform salt in [0, nSalt); the build
  * side is replicated nSalt times (explode over the salt range); the join
  * key becomes (key, salt), so the hot key's rows spread over nSalt tasks.
  * Cost: build side scales by nSalt — keep the REPLICATED side the smaller
  * one and nSalt near the executor-count granularity, not higher.
  *
  * Exact same result set as the plain join (each probe row meets each
  * matching build row exactly once, under exactly one salt value; an
  * unmatched probe row in a left join nulls out exactly once, under its
  * one salt).
  */
object Skew {

  /** Equi-join of `probe` and `build` on `key`, salted `nSalt` ways.
    * `probe` is the large/skewed side (salted); `build` is replicated.
    *
    * The salt comes from `monotonically_increasing_id` — a per-row source
    * INDEPENDENT of row content — so fully duplicate probe rows (identical
    * key + payload, the common shape of a hot key after projection) still
    * spread across all nSalt partitions; a content hash would send every
    * copy to one salt and leave the hot partition whole. The salt never
    * escapes the join, so result parity is unaffected.
    *
    * `joinType` may be any probe-preserving type — inner, left/left_outer,
    * left_semi, left_anti — where replicating the build side keeps the
    * result identical to the unsalted join. Build-preserving types (right/
    * full) would emit each unmatched build row once PER SALT and are
    * rejected. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 nSalt: Int, joinType: String = "inner"): DataFrame = {
    require(nSalt > 0, "nSalt must be positive")
    val probePreserving =
      Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti")
    require(probePreserving(joinType.toLowerCase),
      s"saltedJoin supports probe-preserving join types only, got $joinType")
    val saltP = pmod(hash(monotonically_increasing_id()), lit(nSalt))
    val p = probe.withColumn("_salt", saltP)
    val b = build.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    p.join(b, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Rows per (key)-hash partition for `df` under `n` partitions — the
    * diagnostic a skew investigation starts from: max/mean >> 1 means one
    * task drags the stage. */
  def partitionHistogram(df: DataFrame, key: String, n: Int): DataFrame =
    df.groupBy(pmod(hash(col(key)), lit(n)).as("partition"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
}

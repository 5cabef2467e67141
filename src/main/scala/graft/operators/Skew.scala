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
  * Exact same result set as the plain inner join (each probe row meets
  * each matching build row exactly once, under exactly one salt value).
  */
object Skew {

  /** Inner equi-join of `probe` and `build` on `key`, salted `nSalt` ways.
    * `probe` is the large/skewed side (salted); `build` is replicated. The
    * salt is derived from a hash of the probe row's whole projection, so
    * it is deterministic and uniform without needing a unique id column. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 nSalt: Int): DataFrame = {
    require(nSalt > 0, "nSalt must be positive")
    val saltP = pmod(hash(probe.columns.map(col): _*), lit(nSalt)).as("_salt")
    val p = probe.withColumn("_salt", saltP)
    val b = build.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** Rows per (key)-hash partition for `df` under `n` partitions — the
    * diagnostic a skew investigation starts from: max/mean >> 1 means one
    * task drags the stage. */
  def partitionHistogram(df: DataFrame, key: String, n: Int): DataFrame =
    df.groupBy(pmod(hash(col(key)), lit(n)).as("partition"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles (k-th smallest, k = ceil(p*n/100), no
  * interpolation) via two-phase range-bucketed selection — the scale-safe
  * replacement for the "cumulative window over the global value histogram"
  * plan, whose single unpartitioned ordered window funnels every distinct
  * value through ONE task. Reference analog: the percentile/SLA reporting
  * the reference's refined tables feed (resources/architecture/
  * sttm-requirements.md:87-142 target-table analytics).
  *
  * Phase shape (no global sort, no unbounded single-task window):
  *   1. one hash aggregation builds the distinct-value histogram;
  *   2. values are range-bucketed into `nBuckets` equal-width buckets
  *      between the observed min/max (1-row broadcast); per-bucket counts
  *      aggregate to <= nBuckets rows;
  *   3. a cumulative sum over those <= nBuckets rows locates, for each
  *      requested percentile, the single target bucket and the rank still
  *      needed inside it (this window IS unpartitioned, but its input is
  *      the constant-bounded bucket-count table, never data-scale);
  *   4. the ordered selection then runs ONLY inside the target bucket —
  *      a window partitioned by bucket id, so the per-task sort is bounded
  *      by the largest bucket's distinct-value count (~n_distinct/nBuckets
  *      for non-degenerate distributions), not the corpus.
  *
  * At 100 TB, raise `nBuckets` so histogram_size/nBuckets fits a task
  * (the bucket-count table stays metadata-scale: nBuckets rows). A
  * degenerate distribution (one value dominating) caps that bucket's
  * DISTINCT count at 1 row per duplicated value, so duplicates never
  * enlarge the sort.
  *
  * Exactness: global_cum(v) = cum_before(bucket(v)) + in_bucket_cum(v)
  * for every v in the target bucket, so "min value with in-bucket cum >=
  * k - cum_before" is identical to "min value with global cum >= k" — the
  * selected value is the stored k-th smallest, bit-identical across
  * engines.
  */
object Percentiles {

  /** Exact percentiles of `valueCol`; returns one row per requested
    * percentile with columns (pct, value). `pcts` are integer percents.
    *
    * Arity contract (ADVICE r14): one row per DISTINCT requested
    * percentile that selects a value — duplicate pcts collapse to one
    * row, and empty input or an out-of-range pct (k lands outside the
    * data, e.g. pct > 100) yields NO row for it, never a (pct, null)
    * row. (The pre-r14 per-pct UNION form emitted (pct, null) in those
    * degenerate cases; the declared queries pass in-range distinct pcts
    * over non-empty inputs, where the two forms agree row-for-row.) */
  def exactKth(values: DataFrame, valueCol: String, pcts: Seq[Int],
               nBuckets: Int = 1024): DataFrame = {
    val hist = values.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hist.agg(min("value").as("vmin"), max("value").as("vmax"),
      sum("cnt").as("n"))
    // Equal-width range bucket; the vmax row itself caps to the last one.
    val histB = hist.crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("vmin")) /
              ((col("vmax") - col("vmin")) / nBuckets)),
            lit(nBuckets - 1L))))
      .select(col("value"), col("cnt"), col("bucket"), col("n"))
    val bcnt = histB.groupBy("bucket").agg(sum("cnt").as("bc"))
    val wb = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val bcum = bcnt.withColumn("cumb", sum("bc").over(wb))
      .crossJoin(broadcast(stats.select("n")))
    // r14 optimization (guide §2.4): the per-percentile UNION arms each
    // re-derived the full histogram pipeline from the raw scan — 3
    // requested percentiles = 3 corpus passes + 3 bucket-count shuffles.
    // All percentiles now ride ONE pass: the requested pct list is a
    // literal column exploded over the (<= nBuckets)-row cumulative table,
    // the per-pct target buckets come out of one metadata-scale
    // aggregation, and the single in-bucket selection window partitions by
    // (pct, bucket) — within a partition the joined (k, cum_before) are
    // constants, so each pct's selection is exactly the old single-arm
    // window. Same rows, same schema, bit-identical values.
    val wIn = Window.partitionBy("pct", "bucket").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val targets = bcum
      .select(col("bucket"), col("bc"), col("cumb"), col("n"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .withColumn("k", expr("(pct * n + 99) div 100"))
      .filter(col("cumb") >= col("k"))
      .groupBy("pct")
      .agg(min_by(
        struct(col("bucket"), (col("cumb") - col("bc")).as("cum_before"),
          col("k")),
        col("bucket")).as("t"))
      .select(col("pct"), col("t.bucket").as("bucket"), col("t.cum_before"),
        col("t.k"))
    histB.select("value", "cnt", "bucket")
      .join(broadcast(targets), Seq("bucket"))
      .withColumn("cum_in", sum("cnt").over(wIn))
      .filter(col("cum_in") >= col("k") - col("cum_before"))
      .groupBy("pct")
      .agg(min("value").as("value"))
      .select(col("pct"), col("value"))
  }

  /** Per-group exact percentiles — the grouped form of [[exactKth]]
    * ("p50/p90/p99 document length per source", the per-domain gate
    * report). Same two-phase selection with the group key threaded
    * through every stage, so ALL windows are partitioned (per-group
    * bucket-cumulative over ≤ nBuckets rows; in-bucket ordered selection
    * per (group, bucket)) — no stage anywhere sorts more than one group's
    * share of one bucket. Group stats ride a broadcast #groups-row
    * table. Bucket boundaries only partition the search — the selected
    * value is the exact k-th smallest regardless, so no floating-point
    * bucket arithmetic can affect the result.
    *
    * Returns one row per (group, pct): (groupCol, pct, value). */
  def exactKthByGroup(values: DataFrame, groupCol: String, valueCol: String,
                      pcts: Seq[Int], nBuckets: Int = 1024): DataFrame = {
    val g = col(groupCol)
    val hist = values.groupBy(g, col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hist.groupBy(g)
      .agg(min("value").as("vmin"), max("value").as("vmax"),
        sum("cnt").as("n"))
    val histB = hist.join(broadcast(stats), Seq(groupCol))
      .withColumn("bucket",
        when(col("vmax") === col("vmin"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("vmin")) /
              ((col("vmax") - col("vmin")) / nBuckets)),
            lit(nBuckets - 1L))))
      .select(g, col("value"), col("cnt"), col("bucket"), col("n"))
    val bcnt = histB.groupBy(g, col("bucket")).agg(sum("cnt").as("bc"))
    val wb = Window.partitionBy(g).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val bcum = bcnt.withColumn("cumb", sum("bc").over(wb))
      .join(broadcast(stats.select(g, col("n"))), Seq(groupCol))
    // One pass for ALL requested percentiles — the exactKth r14 rewrite
    // with the group key threaded through (same rows/schema/values as the
    // per-pct UNION arms this replaces; the selection window partitions by
    // (group, pct, bucket) so no task ever sorts more than one group's
    // share of one bucket, exactly as before).
    val wIn = Window.partitionBy(g, col("pct"), col("bucket")).orderBy("value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val targets = bcum
      .select(g, col("bucket"), col("bc"), col("cumb"), col("n"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .withColumn("k", expr("(pct * n + 99) div 100"))
      .filter(col("cumb") >= col("k"))
      .groupBy(g, col("pct"))
      .agg(min_by(
        struct(col("bucket"), (col("cumb") - col("bc")).as("cum_before"),
          col("k")),
        col("bucket")).as("t"))
      .select(g, col("pct"), col("t.bucket").as("bucket"),
        col("t.cum_before"), col("t.k"))
    histB.select(g, col("value"), col("cnt"), col("bucket"))
      .join(broadcast(targets), Seq(groupCol, "bucket"))
      .withColumn("cum_in", sum("cnt").over(wIn))
      .filter(col("cum_in") >= col("k") - col("cum_before"))
      .groupBy(g, col("pct"))
      .agg(min("value").as("value"))
      .select(g, col("pct"), col("value"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage control for iterative operators (connected components, label
  * propagation, PageRank, BPE merges, k-means).
  *
  * Every multi-round loop in this library materializes its per-round state
  * so round n reads stored blocks instead of re-deriving rounds 1..n-1
  * (without this, the plan — and Catalyst's analysis time — grows without
  * bound). HOW it materializes is a durability decision:
  *
  *   - `localCheckpoint()` pins blocks to executor block managers. Fast
  *     (no replication, no DFS write), but on a real cluster an executor
  *     loss mid-loop either kills the job or silently recomputes from a
  *     NONDETERMINISTIC upstream — unacceptable for a 20-round job over
  *     100 TB that has already paid 19 rounds.
  *   - `checkpoint()` writes blocks to the SparkContext checkpoint dir
  *     (HDFS/S3 on a cluster) and truncates lineage against a durable
  *     store: executor loss costs a re-read, never a recompute.
  *
  * Contract: callers opt into durable mode the standard Spark way —
  * `spark.sparkContext.setCheckpointDir(path)` before invoking the
  * operator. When a checkpoint dir is configured, every per-round
  * materialization in this library uses reliable `checkpoint()`; when not
  * (tests, local pipelines), it falls back to `localCheckpoint()`. Both
  * are eager, and both produce IDENTICAL results — [[graft.IterateSpec]]
  * runs one loop in each mode and asserts equality.
  */
object Iterate {

  /** Materialize `df` eagerly and cut its lineage: reliable
    * `checkpoint()` when the session has a checkpoint dir configured,
    * `localCheckpoint()` otherwise. */
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}

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
    * `localCheckpoint()` otherwise.
    *
    * Reliable mode wraps the checkpoint in persist()/unpersist():
    * Spark's reliable checkpoint runs a SECOND job to write the files
    * after the eager count computes them, and without a persisted copy
    * that write job recomputes the whole plan — doubling every round's
    * cost. With the persist, the count caches partitions and the write
    * job reads the cache; the cache is dropped as soon as the files are
    * down (the returned frame scans the checkpoint files, not the cache).
    *
    * Housekeeping note for long loops: checkpoint files of superseded
    * rounds are reclaimed by Spark's ContextCleaner only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false) — set it in cluster deployments, or accept a bounded
    * rounds × |state| footprint under the checkpoint dir for the
    * application's lifetime. */
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint()
      finally df.unpersist(blocking = false)
    } else df.localCheckpoint()
}

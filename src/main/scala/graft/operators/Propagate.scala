package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score propagation over a similarity graph.
  *
  * Training-data curation treats near-duplicate documents as evidence
  * about EACH OTHER: if one copy of a paraphrase family is known-good
  * (high quality score, trusted source), its near-duplicates inherit
  * that signal. This is the graph-smoothing step between pairwise dedup
  * (TextDedup.nearDuplicatePairs) and per-cluster canonical selection —
  * the same shape as label propagation in web-corpus quality filtering,
  * where a page's score is pooled over its duplicate family.
  *
  * [[maxPropagate]] runs k rounds of newScore(v) = max(score(v),
  * max over neighbors u of score(u)) — after round k every vertex
  * carries the maximum score within its k-hop neighborhood, and run to
  * the component diameter it converges to the per-component max (the
  * fixpoint [[PropagateSpec]] checks against dedupClusters' components).
  * Bounded k is the production knob: at 100 TB a giant duplicate family
  * should lift only its graph neighborhood, not pay a full transitive
  * closure.
  *
  * Scale shape: each round is one equi-join of the symmetric edge list
  * against the current score table (shuffle keyed by vertex id) plus a
  * map-side-combining max aggregation over O(|E|) rows, then a left
  * join back onto the |V|-row score table — the same per-round cost as
  * [[graft.operators.TextDedup.dedupClusters]]'s hash-min CC, with the
  * per-round `localCheckpoint` keeping lineage flat. All integer
  * arithmetic, so any SQL engine reproduces the result bit-for-bit.
  *
  * Reference anchor: composes the dedup machinery the reference's XREF
  * latest-by-key discipline implies (sttm-requirements.md §incremental
  * snapshots); the propagation itself is public LLM-pipeline practice
  * (duplicate-family quality pooling).
  */
object Propagate {

  /** K-round max-propagation of integer `scoreCol` over undirected
    * `pairs(id1, id2)`. Returns (`idCol`, `scoreCol`) with the propagated
    * value; vertices absent from `pairs` keep their own score. */
  def maxPropagate(scores: DataFrame, idCol: String, scoreCol: String,
                   pairs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val edges = pairs.select(col("id1").as("_a"), col("id2").as("_b"))
      .unionByName(pairs.select(col("id2").as("_a"), col("id1").as("_b")))
      .distinct().localCheckpoint()
    var cur = scores.select(col(idCol), col(scoreCol).cast("long").as("_s"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val nbrMax = edges
        .join(cur.select(col(idCol).as("_b"), col("_s").as("_ns")), Seq("_b"))
        .groupBy(col("_a").as(idCol)).agg(max(col("_ns")).as("_nmax"))
      cur = cur.join(nbrMax, Seq(idCol), "left")
        .select(col(idCol),
          greatest(col("_s"), coalesce(col("_nmax"), col("_s"))).as("_s"))
        .localCheckpoint()
    }
    cur.withColumnRenamed("_s", scoreCol)
  }

  /** Keep-best canonical selection: one representative per cluster, the
    * member with the HIGHEST integer score (ties broken by the smaller
    * id — fully deterministic). This is the dedup retention policy a
    * curation pipeline actually wants: `dedupClusters` labels families,
    * but "keep the minimum doc id" throws away quality information —
    * keep-best retains the best-scored copy of each paraphrase family.
    *
    * One window partitioned BY CLUSTER (never global): per-partition
    * work is the cluster size, which the dedup chain already bounds.
    * Returns (clusterCol, `idCol`, `scoreCol`) — one row per cluster. */
  def keepBest(clusters: DataFrame, idCol: String, clusterCol: String,
               scores: DataFrame, scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    clusters.join(scores, Seq(idCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(clusterCol), col(idCol), col(scoreCol))
  }
}

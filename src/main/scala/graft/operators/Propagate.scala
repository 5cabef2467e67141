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
  * per-round [[Iterate.checkpoint]] keeping lineage flat (reliable
  * checkpoint when a checkpoint dir is set — see [[Iterate]]). All integer
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
    val edges = Iterate.checkpoint(
      pairs.select(col("id1").as("_a"), col("id2").as("_b"))
        .unionByName(pairs.select(col("id2").as("_a"), col("id1").as("_b")))
        .distinct())
    var cur = Iterate.checkpoint(
      scores.select(col(idCol), col(scoreCol).cast("long").as("_s")))
    for (_ <- 1 to iters) {
      val nbrMax = edges
        .join(cur.select(col(idCol).as("_b"), col("_s").as("_ns")), Seq("_b"))
        .groupBy(col("_a").as(idCol)).agg(max(col("_ns")).as("_nmax"))
      cur = Iterate.checkpoint(cur.join(nbrMax, Seq(idCol), "left")
        .select(col(idCol),
          greatest(col("_s"), coalesce(col("_nmax"), col("_s"))).as("_s")))
    }
    cur.withColumnRenamed("_s", scoreCol)
  }

  /** Deterministic integer PageRank over undirected `pairs(id1, id2)` —
    * graph centrality for the similarity/link graph: which documents sit
    * at the center of large paraphrase families (dedup triage priority),
    * which entities anchor a cross-reference web. The float PageRank every
    * engine ships is NOT reproducible across engines (summation order);
    * this one restates the recurrence in exact 64-bit arithmetic so any
    * SQL engine emits bit-identical ranks:
    *
    *   r0(v)   = scale div N
    *   share(u)= r(u) div deg(u)
    *   r'(v)   = base + (dampBp * sum over in-nbrs u of share(u)) div 10000
    *   base    = ((10000 - dampBp) * (scale div N)) div 10000
    *
    * All floor divisions on non-negative longs, so Spark's `div` and
    * DuckDB's `//` agree exactly. Headroom: the in-neighbor share sum is
    * bounded by the total mass `scale`, so the widest intermediate is
    * dampBp * scale — at the defaults 8.5e15, far under 2^63.
    *
    * Scale shape: per round, ONE |V|-row equi-join attaching (rank, degree)
    * to each source vertex, ONE |E|-row equi-join + map-side-combining sum
    * into per-vertex inboxes, and a left join back onto the vertex list —
    * the textbook Pregel/GraphX iteration re-expressed as DataFrame joins,
    * with [[Iterate.checkpoint]] per round keeping lineage flat. Bounded
    * `iters` is the production knob (ranks are wanted as a *signal*, not
    * to convergence). Dangling vertices contribute nothing and keep the
    * `base` floor; duplicate rows in `pairs` count as parallel edges.
    */
  def pageRank(vertices: DataFrame, idCol: String, pairs: DataFrame,
               iters: Int, dampBp: Int = 8500,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampBp >= 0 && dampBp <= 10000, s"dampBp in [0,10000], got $dampBp")
    val edges = Iterate.checkpoint(
      pairs.select(col("id1").as("_a"), col("id2").as("_b"))
        .unionByName(pairs.select(col("id2").as("_a"), col("id1").as("_b"))))
    // n is a driver-side metadata scalar (like Clustering's k x dim
    // centroid rows) — it parameterizes the constant base/init literals.
    val n = vertices.select(col(idCol)).count()
    require(n > 0, "pageRank needs at least one vertex")
    val init = scale / n
    val base = ((10000L - dampBp) * init) / 10000L
    val deg = Iterate.checkpoint(
      edges.groupBy(col("_a")).agg(count(lit(1)).as("_d")))
    var cur = Iterate.checkpoint(
      vertices.select(col(idCol)).withColumn("_r", lit(init)))
    for (_ <- 1 to iters) {
      val share = cur.join(deg, cur(idCol) === deg("_a"))
        .select(col("_a"), expr("_r div _d").as("_share"))
      val inbox = edges.join(share, Seq("_a"))
        .groupBy(col("_b").as(idCol)).agg(sum(col("_share")).as("_s"))
      cur = Iterate.checkpoint(cur.join(inbox, Seq(idCol), "left")
        .select(col(idCol),
          (lit(base) +
            expr(s"($dampBp * coalesce(_s, 0L)) div 10000")).as("_r")))
    }
    cur.withColumnRenamed("_r", "pr")
  }

  /** Personalized (seeded) PageRank — the seed-and-expand curation move:
    * start from a trusted seed set (hand-audited docs, a curated domain
    * list) and let rank flow over the similarity graph to surface the
    * documents most connected to the seeds. Same exact floor-div integer
    * recurrence as [[pageRank]], with the teleport mass restricted to the
    * seeds: r0(v) = scale div |S| for seeds else 0, and per round
    * r'(v) = seedBase(v) + (dampBp * inboxSum(v)) div 10000 where
    * seedBase is ((10000-dampBp) * (scale div |S|)) div 10000 on seeds
    * and 0 elsewhere; |S| counts the seeds actually present in
    * `vertices` (absent seed ids carry no mass and must not dilute the
    * teleport share of the real ones). Non-seed vertices are ranked purely by their
    * (multi-hop) connectivity to the seed set; unreachable vertices stay
    * at 0. Same per-round join shape and headroom as [[pageRank]].
    */
  def personalizedPageRank(vertices: DataFrame, idCol: String,
                           seeds: DataFrame, pairs: DataFrame, iters: Int,
                           dampBp: Int = 8500,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampBp >= 0 && dampBp <= 10000, s"dampBp in [0,10000], got $dampBp")
    val edges = Iterate.checkpoint(
      pairs.select(col("id1").as("_a"), col("id2").as("_b"))
        .unionByName(pairs.select(col("id2").as("_a"), col("id1").as("_b"))))
    val deg = Iterate.checkpoint(
      edges.groupBy(col("_a")).agg(count(lit(1)).as("_d")))
    // seed flag rides the score table so the per-round base is a column
    val flagged = Iterate.checkpoint(vertices.select(col(idCol))
      .join(seeds.select(col(idCol)).distinct().withColumn("_seed", lit(1L)),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_seed"), lit(0L)).as("_seed")))
    // |S| counts seeds PRESENT IN `vertices` (the sum of the joined flag):
    // a seed id absent from the vertex set carries no teleport mass, so
    // counting raw seed rows would dilute init/base for the real seeds
    // (ADVICE r6). Callers may pass seed lists that over-approximate.
    // coalesce: sum over ZERO rows (empty vertex table) is null — unboxing
    // it would NPE; fold to 0 so both degenerate inputs (empty vertices,
    // seeds disjoint from vertices) hit the clear require below instead.
    val nSeeds =
      flagged.agg(coalesce(sum(col("_seed")), lit(0L))).first().getLong(0)
    require(nSeeds > 0, "personalizedPageRank needs at least one seed present in vertices")
    val init = scale / nSeeds
    val base = ((10000L - dampBp) * init) / 10000L
    var cur = Iterate.checkpoint(
      flagged.withColumn("_r", col("_seed") * init))
    for (_ <- 1 to iters) {
      val share = cur.join(deg, cur(idCol) === deg("_a"))
        .select(col("_a"), expr("_r div _d").as("_share"))
      val inbox = edges.join(share, Seq("_a"))
        .groupBy(col("_b").as(idCol)).agg(sum(col("_share")).as("_s"))
      cur = Iterate.checkpoint(cur.join(inbox, Seq(idCol), "left")
        .select(col(idCol), col("_seed"),
          (col("_seed") * base +
            expr(s"($dampBp * coalesce(_s, 0L)) div 10000")).as("_r")))
    }
    cur.select(col(idCol), col("_r").as("ppr"))
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

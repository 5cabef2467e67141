package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, greatest, hash, least, lit, max, pmod, when}

/** Maintained verified near-duplicate pair graph — the third stored
  * curation artifact, closing the loop the other two opened: the
  * [[DedupIndex]] makes per-batch MATCHING incremental, but every session
  * that needed the corpus-wide pair set (dedup clusters, connected
  * components, quality propagation, PageRank) still recomputed the full
  * signature+LSH+verify self-join (~16 s/session at sf0.1; at 100 TB, a
  * corpus-scale job per consumer). This store persists the verified pair
  * set once and grows it per ingestion batch, so consumers read a parquet
  * table whose size tracks the DUPLICATE population, not the corpus.
  *
  * Layout under one root (v3, the [[GenStore]] segment manifest):
  *
  *   `<dir>/_META`              `v3 gen=<g> segs=<...>` pointer / marker
  *   `<dir>/g<g>/<seg>/pairs`   (id1, id2, jac), id1 < id2 — one segment
  *                              per build/append, committed atomically
  *   `<dir>/index`              an embedded [[DedupIndex]] of every doc so
  *                              far (its own manifest)
  *
  * Appends are atomic segments; batchId-keyed appends are idempotent
  * under streaming retries; compaction serves through the swing and CAS-
  * fails rather than dropping a racing append — the shared [[GenStore]]
  * contract. The embedded index commits SECOND on every append, so its
  * batchId segment doubles as the "fully applied" marker the idempotent
  * gate loop checks ([[graft.streaming.StreamingDedup.gateAndMaintainPairs]]).
  *
  * INCREMENTAL DISCIPLINE: [[build]] writes the corpus self-join pairs
  * ([[TextDedup.nearDuplicatePairs]] — capped LSH + hot-bucket exact
  * recovery). [[append]] adds exactly two edge sets per batch: the
  * CROSS edges (batch × stored corpus) from
  * [[DedupIndex.matchBatchPairs]] — all verified pairs, pruned stored-side
  * reads, never a corpus rehash — and the batch's INTERNAL edges (its own
  * self-join, batch-sized). The union over a build + N appends therefore
  * covers every (old, new) combination exactly once; the stored set is
  * deterministic and mirrored row-for-row by the DuckDB oracle
  * (q_pair_store). Per-batch cost is the batch signature pass plus
  * touched-bucket joins — the same flat-cost contract as the index itself.
  *
  * The cross edges come from the k=8/4-band index signature, the
  * self-join edges from the k=16/8-band pipeline signature — the same
  * asymmetry the two underlying operators already have ([[TextDedup]]
  * class docs); both verify with the exact floored trigram Jaccard, so
  * every stored edge is exact regardless of which path found it.
  */
object PairStore {

  private val Legacy = Set("pairs") // v1 kept a flat pairs dir at the root

  /** The verification threshold and bucket ceiling are properties of the
    * STORE, not of any one call: every edge in the graph was kept at the
    * build-time `minJaccard`, so an append mining at a different floor
    * would silently hole the band in between (a 0.25-floor graph appended
    * at the 0.6 default loses every [0.25, 0.6) edge for that batch).
    * [[build]] records both under `<dir>/_PARAMS`; [[append]]/
    * [[appendGated]] use the recorded values, treating their own
    * parameters as (a) the fallback for stores created before the marker
    * existed and (b) a cross-check — an explicit value that matches
    * neither the recorded one nor the signature default is a caller
    * contradiction and throws rather than corrupting the band. */
  private def writeParams(dir: String, minJaccard: Double,
                          maxBucket: Int): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_PARAMS"),
      s"minJaccard=$minJaccard maxBucket=$maxBucket")

  private def storedParams(dir: String): Option[(Double, Int)] = {
    val p = java.nio.file.Paths.get(s"$dir/_PARAMS")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val kv = java.nio.file.Files.readString(p).trim.split("\\s+")
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      for (t <- kv.get("minJaccard"); c <- kv.get("maxBucket"))
        yield (t.toDouble, c.toInt)
    }
  }

  private def effectiveParams(dir: String, minJaccard: Double,
                              maxBucket: Int): (Double, Int) =
    storedParams(dir) match {
      case None => (minJaccard, maxBucket)
      case Some((t, c)) =>
        require(minJaccard == 0.6 || minJaccard == t,
          s"append minJaccard=$minJaccard contradicts the store's recorded " +
            s"mining floor $t at $dir — the threshold is a store property")
        require(maxBucket == 4096 || maxBucket == c,
          s"append maxBucket=$maxBucket contradicts the store's recorded " +
            s"ceiling $c at $dir")
        (t, c)
    }

  /** The store's gating threshold: the recorded mining floor when present
    * (the caller's value cross-checked exactly as in [[append]]), else the
    * caller's own. The ingest gate MUST match at this floor — gating at a
    * higher threshold against a lower-floor store (e.g. the default 0.6
    * against a 0.25 contrastive-mining store) would pass docs whose
    * [floor, threshold) cross edges [[appendGated]] then assumes empty,
    * permanently holing the stored band the _PARAMS marker exists to
    * protect (ADVICE r08). */
  def gateThreshold(dir: String, minJaccard: Double = 0.6,
                    maxBucket: Int = 4096): Double =
    effectiveParams(dir, minJaccard, maxBucket)._1

  /** The live pairs generation directory (exposed for specs/tools). */
  def currentGenDir(dir: String): String =
    GenStore.readOrFail(dir, "PairStore").genDir(dir)

  /** Default id-pfx partition count of the labels table (the
    * [[DedupIndex]] knob); recorded in the manifest, persisted value wins. */
  val DefaultPfx = 64

  private def labelPfx(nPfx: Int) = pmod(hash(col("id")), lit(nPfx))

  private def writeLabels(labels: DataFrame, path: String, nPfx: Int): Unit =
    labels.withColumn("pfx", labelPfx(nPfx))
      .write.mode("overwrite").partitionBy("pfx").parquet(path)

  // scan-pruning evidence for PairStoreSpec (files selected by the last
  // ungated append's old-endpoint labels resolve read); flag-gated — the
  // capture builds an extra physical plan, a per-batch driver cost
  // production never pays
  @volatile private[graft] var scanDiagnostics = false
  private[graft] val lastPrunedLabelFiles =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  def exists(dir: String): Boolean =
    GenStore.read(dir).exists(st =>
      // labels (id-pfx partitioned, nPfx recorded) materialized per
      // segment since round 9 — stores from before read as absent and
      // rebuild once
      st.props.contains("nPfx") &&
        GenStore.tableComplete(dir, st, "pairs", required = st.segs.toSet) &&
        GenStore.tableComplete(dir, st, "labels", required = st.segs.toSet)) &&
      DedupIndex.exists(s"$dir/index")

  /** Create (overwrite) the pair graph for `docs` under `dir`: the corpus
    * self-join pair set plus the index future appends match against. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            minJaccard: Double = 0.6, maxBucket: Int = 4096,
            oracleParity: Boolean = true, nPfx: Int = DefaultPfx): Unit = {
    require(nPfx > 0, s"nPfx must be positive, got $nPfx")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // rebuild window: marker dropped before any data is touched, so a
    // crash mid-build reads as absent (same discipline as DedupIndex);
    // stale generations / legacy layouts cleared for a clean slate
    GenStore.clearMeta(dir)
    GenStore.pruneGens(dir, keep = Set.empty, legacy = Legacy)
    writeParams(dir, minJaccard, maxBucket)
    DedupIndex.build(docs, idCol, textCol, s"$dir/index",
      oracleParity = oracleParity)
    val seg = s"$dir/g0/${GenStore.BaseSeg}"
    val p = TextDedup.nearDuplicatePairs(docs, idCol, textCol, minJaccard,
      maxBucket, oracleParity)
    p.write.mode("overwrite").parquet(s"$seg/pairs")
    // Cluster labels MATERIALIZED with the graph (VERDICT r08 #8): the CC
    // fixpoint runs once at build over the just-written pairs (read back
    // with the explicit schema, so it is never recomputed from the corpus
    // and an edge-free corpus still round-trips), not once per consumer
    // session. Appends keep them current via per-segment deltas; the
    // id-pfx directory partitions let the append's old-endpoint resolve
    // join prune its read to the touched ids (the DedupIndex discipline).
    val stored = docs.sparkSession.read.schema(p.schema).parquet(s"$seg/pairs")
    writeLabels(TextDedup.ccLabels(stored.select(col("id1"), col("id2"))),
      s"$seg/labels", nPfx)
    GenStore.init(dir,
      GenStore.State(0, Vector(GenStore.BaseSeg), Map("nPfx" -> nPfx)))
  }

  /** Grow the graph by one accepted batch (ids disjoint from the stored
    * corpus): cross edges against the stored index + the batch's internal
    * edges, then extend the index so the NEXT batch sees this one. Each
    * side is one atomic segment; with `batchId` set, both commits are
    * idempotent under retries (pairs first, index second — a retry after
    * a crash between them recomputes nothing stale, because the match
    * runs against an index that does not yet contain the batch).
    * `minJaccard`/`maxBucket` are the legacy-store fallback and
    * cross-check only — the store's recorded build parameters govern
    * (see [[writeParams]]). */
  def append(batch: DataFrame, idCol: String, textCol: String, dir: String,
             minJaccard: Double = 0.6, maxBucket: Int = 4096,
             oracleParity: Boolean = true,
             batchId: Option[Long] = None): Unit = {
    require(exists(dir), s"no complete PairStore at $dir")
    val (thr, cap) = effectiveParams(dir, minJaccard, maxBucket)
    val seg = batchId.map(GenStore.batchSeg).getOrElse(GenStore.freshSeg())
    GenStore.appendSeg(dir, "PairStore", seg) { (st, segDir) =>
      val cross = DedupIndex.matchBatchPairs(batch, idCol, textCol,
          s"$dir/index", thr, cap, oracleParity)
        .select(least(col("new_id"), col("old_id")).as("id1"),
          greatest(col("new_id"), col("old_id")).as("id2"), col("jac"))
      val internal = TextDedup.nearDuplicatePairs(batch, idCol, textCol,
        thr, cap, oracleParity)
      val all = cross.unionByName(internal)
      all.write.mode("overwrite").parquet(s"$segDir/pairs")
      writeLabelDelta(batch, idCol, dir, st, segDir, all.schema)
    }
    DedupIndex.append(batch, idCol, textCol, s"$dir/index", oracleParity,
      batchId)
  }

  /** Per-segment cluster-label delta (VERDICT r08 #8 — labels are part of
    * the MAINTAINED artifact, so graph consumers read them instead of
    * re-running the CC fixpoint per session). The mini-graph contracts
    * every old endpoint to its CURRENT resolved cluster label (or itself
    * for a previously edge-free doc), so its CC runs over batch ids plus
    * touched old cluster labels — batch-bounded, never the corpus. The
    * delta lands in the same atomic segment as the pairs:
    *   `labels` — (id, lbl) for newly edge-incident docs (batch docs and
    *              old singletons first touched by a cross edge);
    *   `remaps` — (frm, to) for stored cluster labels merged into a
    *              smaller one; readers resolve the remap closure (a tiny
    *              merges-since-compact table) and [[compact]] folds it
    *              away. Min-id semantics hold globally because a stored
    *              label IS the min of its members, so the mini-CC min
    *              over {batch ids, old labels} is the true cluster min.
    * The old-endpoint resolve read is PRUNED to the touched old ids'
    * id-pfx partitions (one metadata-scale collect over the batch-bounded
    * edge endpoints — the DedupIndex discipline; without it every ungated
    * append paid a stored-labels corpus scan); gated appends
    * ([[appendGated]]) have no cross edges and skip `cur` entirely. */
  private def writeLabelDelta(batch: DataFrame, idCol: String, dir: String,
                              st: GenStore.State, segDir: String,
                              pairSchema: org.apache.spark.sql.types.StructType)
                             : Unit = {
    val spark = batch.sparkSession
    val nPfx = st.props("nPfx")
    // read the just-written pairs back (explicit schema: an edge-free
    // batch leaves a data-less dir) — never recompute the match
    val e = spark.read.schema(pairSchema).parquet(s"$segDir/pairs")
      .select(col("id1"), col("id2"))
      .localCheckpoint() // feeds the pfx collect AND the node-map joins
    val bIds = batch.select(col(idCol).as("bid")).distinct()
    // metadata-scale collect: the touched OLD endpoints' pfx values (at
    // most nPfx small ints off a batch-bounded edge list)
    val oldPfx = e.select(col("id1").as("id"))
      .unionByName(e.select(col("id2").as("id"))).distinct()
      .join(bIds.withColumnRenamed("bid", "id"), Seq("id"), "left_anti")
      .select(labelPfx(nPfx).as("pfx")).distinct()
      .collect().map(_.getInt(0))
    val cur = labelsFor(spark, dir, st, Some(oldPfx))
    def side(c: String, l: String, b: String): Seq[org.apache.spark.sql.Column] =
      Seq(when(coalesce(col(b), lit(false)), col(c))
            .otherwise(coalesce(col(l), col(c))).as(c),
        (!coalesce(col(b), lit(false)) && col(l).isNotNull).as(s"_had$c"))
    val m = e
      .join(broadcast(bIds.select(col("bid").as("id1"), lit(true).as("b1"))),
        Seq("id1"), "left")
      .join(broadcast(bIds.select(col("bid").as("id2"), lit(true).as("b2"))),
        Seq("id2"), "left")
      .join(cur.select(col("id").as("id1"), col("lbl").as("l1")), Seq("id1"), "left")
      .join(cur.select(col("id").as("id2"), col("lbl").as("l2")), Seq("id2"), "left")
      .select(side("id1", "l1", "b1") ++ side("id2", "l2", "b2")
        ++ Seq(coalesce(col("b1"), lit(false)).as("_b1"),
          coalesce(col("b2"), lit(false)).as("_b2")): _*)
      .localCheckpoint() // node meta + CC input; batch-bounded
    val mini = TextDedup.ccLabels(m.select(col("id1"), col("id2")))
    // per-node metadata: batch doc / stored-label / old-singleton
    val nodeMeta = m.select(col("id1").as("id"), col("_b1").as("isB"), col("_hadid1").as("had"))
      .unionByName(m.select(col("id2").as("id"), col("_b2").as("isB"), col("_hadid2").as("had")))
      .groupBy("id").agg(max(col("isB")).as("isB"), max(col("had")).as("had"))
    val tagged = mini.join(nodeMeta, Seq("id"))
    writeLabels(tagged.filter(col("isB") || !col("had"))
      .select(col("id"), col("lbl")), s"$segDir/labels", nPfx)
    tagged.filter(!col("isB") && col("had") && col("lbl") =!= col("id"))
      .select(col("id").as("frm"), col("lbl").as("to"))
      .write.mode("overwrite").parquet(s"$segDir/remaps")
  }

  /** Resolved cluster labels pinned to `st`: the stored per-segment label
    * rows with the remap closure applied. The closure input is the
    * merges-since-compact table — tiny, and absent entirely for
    * build-only or gated-append stores, where this is ONE table read.
    * `pfxIn` prunes the read to the given id-pfx partitions (the append's
    * touched-old-ids cut; files of untouched pfx are statically skipped —
    * a strict superset of the resolve equi-join, so results per touched
    * id are identical). */
  private def labelsFor(spark: SparkSession, dir: String,
                        st: GenStore.State,
                        pfxIn: Option[Array[Int]] = None): DataFrame = {
    val labels0 = GenStore.readTable(spark, dir, st, "labels")
    val labels = pfxIn match {
      case None => labels0
      case Some(ps) =>
        val cut = labels0.filter(if (ps.isEmpty) lit(false)
          else col("pfx").isin(ps.map(Integer.valueOf): _*))
        if (scanDiagnostics) lastPrunedLabelFiles.set(
          cut.queryExecution.sparkPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.selectedPartitions.totalNumberOfFiles
          }.sum)
        cut
    }
    val flat = labels.select(col("id"), col("lbl"))
    GenStore.readTableIfAny(spark, dir, st, "remaps") match {
      case None => flat
      case Some(r) =>
        // remap chains only ever merge downward to the component min, so
        // the closure of frm is exactly its CC label over the remap edges
        val closure = TextDedup.ccLabels(
          r.select(col("frm").as("id1"), col("to").as("id2")))
        flat.join(
            closure.select(col("id").as("lbl"), col("lbl").as("_r")),
            Seq("lbl"), "left")
          .select(col("id"), coalesce(col("_r"), col("lbl")).as("lbl"))
    }
  }

  /** The stored cluster labels — (id, lbl) for every doc incident to a
    * stored edge, lbl = min id of its near-dup cluster; docs absent here
    * are singletons (their own cluster). Equal by construction to
    * `TextDedup.ccLabels(pairs(dir))` — [[graft.PairStoreSpec]] asserts
    * the bit-identity through build/append/gated-append/compact — but
    * read from the maintained artifact instead of re-running the CC
    * fixpoint per consumer session. */
  def clusterLabels(spark: SparkSession, dir: String): DataFrame =
    labelsFor(spark, dir, GenStore.readOrFail(dir, "PairStore"))

  /** [[append]] for a GATED batch — one whose ids are already known to
    * have no stored match at or above `minJaccard` (the near-dup ingest
    * gate's survivors: [[graft.streaming.StreamingDedup.gateAndMaintainPairs]]
    * derives them from the very matchBatchPairs result whose emptiness
    * this method banks on). The cross-edge pass is provably a no-op for
    * such a batch — every cross pair the incremental discipline would
    * find was found by the gate and disqualified its doc — so only the
    * batch's internal self-join edges are appended and the index
    * extended, saving the second per-batch signature pass. Feeding an
    * UNGATED batch here loses its cross edges; use [[append]]. */
  def appendGated(batch: DataFrame, idCol: String, textCol: String,
                  dir: String, minJaccard: Double = 0.6,
                  maxBucket: Int = 4096,
                  oracleParity: Boolean = true,
                  batchId: Option[Long] = None): Unit = {
    require(exists(dir), s"no complete PairStore at $dir")
    val (thr, cap) = effectiveParams(dir, minJaccard, maxBucket)
    val seg = batchId.map(GenStore.batchSeg).getOrElse(GenStore.freshSeg())
    GenStore.appendSeg(dir, "PairStore", seg) { (st, segDir) =>
      val p = TextDedup.nearDuplicatePairs(batch, idCol, textCol, thr,
        cap, oracleParity)
      p.write.mode("overwrite").parquet(s"$segDir/pairs")
      // label delta, gated form: a gated batch has NO cross edges (the
      // gate disqualified any doc with a stored match), so its clusters
      // are purely internal — batch-scale CC, no stored-labels scan, no
      // remaps, and min-id semantics hold globally because no component
      // touches a stored one.
      val stored = batch.sparkSession.read.schema(p.schema)
        .parquet(s"$segDir/pairs")
      writeLabels(TextDedup.ccLabels(stored.select(col("id1"), col("id2"))),
        s"$segDir/labels", st.props("nPfx"))
    }
    DedupIndex.append(batch, idCol, textCol, s"$dir/index", oracleParity,
      batchId)
  }

  /** Whether a batchId-keyed append is FULLY applied: the embedded index
    * commits last, so its segment presence covers the pairs segment too. */
  def batchApplied(dir: String, batchId: Long): Boolean =
    DedupIndex.batchApplied(s"$dir/index", batchId)

  /** The surviving doc ids of an already-applied gate batch (see
    * [[DedupIndex.batchDocIds]]). */
  def batchDocIds(spark: SparkSession, dir: String, batchId: Long,
                  idCol: String): DataFrame =
    DedupIndex.batchDocIds(spark, s"$dir/index", batchId, idCol)

  /** Compact the store: consolidate the pairs segments into the NEXT
    * generation's single base segment (~`pairFiles` files) and compact
    * the embedded [[DedupIndex]] (its own manifest discipline). Edges are
    * preserved exactly — [[graft.PairStoreSpec]] asserts the stored graph
    * bit-identical before and after; serve-through-compact and the
    * append-race CAS are [[GenStore.compact]]'s contract. */
  def compact(spark: SparkSession, dir: String, pairFiles: Int = 4): Unit = {
    GenStore.compact(dir, "complete PairStore", Legacy) { (st, base) =>
      require(exists(dir), s"no complete PairStore at $dir")
      GenStore.readTable(spark, dir, st, "pairs").repartition(pairFiles)
        .write.mode("overwrite").parquet(s"$base/pairs")
      // materialize the remap closure into the labels themselves; the
      // next generation starts remap-free (~one file per pfx partition)
      writeLabels(labelsFor(spark, dir, st).repartition(pairFiles),
        s"$base/labels", st.props("nPfx"))
    }
    DedupIndex.compact(spark, s"$dir/index")
  }

  /** The stored pair graph: (id1, id2, jac), id1 < id2, exact floored
    * trigram Jaccard >= the store's recorded mining floor. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    GenStore.readTable(spark, dir, GenStore.readOrFail(dir, "PairStore"),
      "pairs")
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, greatest, least}

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

  def exists(dir: String): Boolean =
    GenStore.read(dir).exists(st =>
      GenStore.tableComplete(dir, st, "pairs", required = st.segs.toSet)) &&
      DedupIndex.exists(s"$dir/index")

  /** Create (overwrite) the pair graph for `docs` under `dir`: the corpus
    * self-join pair set plus the index future appends match against. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            minJaccard: Double = 0.6, maxBucket: Int = 4096,
            oracleParity: Boolean = true): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // rebuild window: marker dropped before any data is touched, so a
    // crash mid-build reads as absent (same discipline as DedupIndex);
    // stale generations / legacy layouts cleared for a clean slate
    GenStore.clearMeta(dir)
    GenStore.pruneGens(dir, keep = Set.empty, legacy = Legacy)
    writeParams(dir, minJaccard, maxBucket)
    DedupIndex.build(docs, idCol, textCol, s"$dir/index",
      oracleParity = oracleParity)
    TextDedup.nearDuplicatePairs(docs, idCol, textCol, minJaccard, maxBucket,
        oracleParity)
      .write.mode("overwrite").parquet(s"$dir/g0/${GenStore.BaseSeg}/pairs")
    GenStore.init(dir, GenStore.State(0, Vector(GenStore.BaseSeg), Map.empty))
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
    GenStore.appendSeg(dir, "PairStore", seg) { (_, segDir) =>
      val cross = DedupIndex.matchBatchPairs(batch, idCol, textCol,
          s"$dir/index", thr, cap, oracleParity)
        .select(least(col("new_id"), col("old_id")).as("id1"),
          greatest(col("new_id"), col("old_id")).as("id2"), col("jac"))
      val internal = TextDedup.nearDuplicatePairs(batch, idCol, textCol,
        thr, cap, oracleParity)
      cross.unionByName(internal)
        .write.mode("overwrite").parquet(s"$segDir/pairs")
    }
    DedupIndex.append(batch, idCol, textCol, s"$dir/index", oracleParity,
      batchId)
  }

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
    GenStore.appendSeg(dir, "PairStore", seg) { (_, segDir) =>
      TextDedup.nearDuplicatePairs(batch, idCol, textCol, thr,
          cap, oracleParity)
        .write.mode("overwrite").parquet(s"$segDir/pairs")
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
    }
    DedupIndex.compact(spark, s"$dir/index")
  }

  /** The stored pair graph: (id1, id2, jac), id1 < id2, exact floored
    * trigram Jaccard >= the store's recorded mining floor. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    GenStore.readTable(spark, dir, GenStore.readOrFail(dir, "PairStore"),
      "pairs")
}

package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
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
  * Layout under one root:
  *
  *   `<dir>/_META`          "v2 gen=<g>" pointer / completion marker
  *   `<dir>/g<g>/pairs`     (id1, id2, jac), id1 < id2 — append-only parquet
  *   `<dir>/index`          an embedded [[DedupIndex]] of every doc so far
  *                          (generation-managed by its own _META)
  *
  * GENERATIONS (serve-through-compact, the [[DedupIndex]] discipline):
  * `_META` names the live pairs generation and swings atomically; a
  * [[compact]] rewrites the accumulated per-append task files into the
  * next generation (and compacts the embedded index), retaining the
  * replaced generation for in-flight readers until the following
  * compaction.
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

  private def metaPath(dir: String) = Paths.get(s"$dir/_META")

  private def readGen(dir: String): Option[Int] = {
    val p = metaPath(dir)
    if (!Files.exists(p)) None
    else """^v2 gen=(\d+)$""".r
      .findFirstMatchIn(Files.readString(p).trim).map(_.group(1).toInt)
  }

  private def writeMeta(dir: String, gen: Int): Unit = {
    val tmp = Paths.get(s"$dir/_META.tmp")
    Files.writeString(tmp, s"v2 gen=$gen")
    Files.move(tmp, metaPath(dir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** The live pairs generation directory (exposed for specs/tools). */
  def currentGenDir(dir: String): String = {
    val g = readGen(dir).getOrElse(sys.error(s"no PairStore _META at $dir"))
    s"$dir/g$g"
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => { Files.deleteIfExists(q); () })
      finally walk.close()
    }

  private def pruneDirs(dir: String, keep: Set[Int]): Unit = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return
    val ls = Files.list(root)
    val entries = try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.toList
    } finally ls.close()
    entries.foreach { p =>
      val name = p.getFileName.toString
      val genOf = """^g(\d+)$""".r.findFirstMatchIn(name).map(_.group(1).toInt)
      // legacy v1 layout kept a flat `pairs` dir at the root
      if (genOf.exists(g => !keep(g)) || name == "pairs") deleteRecursively(p)
    }
  }

  def exists(dir: String): Boolean =
    readGen(dir).exists(g =>
      Files.exists(Paths.get(s"$dir/g$g/pairs/_SUCCESS"))) &&
      DedupIndex.exists(s"$dir/index")

  /** Create (overwrite) the pair graph for `docs` under `dir`: the corpus
    * self-join pair set plus the index future appends match against. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            minJaccard: Double = 0.6, maxBucket: Int = 4096,
            oracleParity: Boolean = true): Unit = {
    Files.createDirectories(Paths.get(dir))
    // rebuild window: marker dropped before any data is touched, so a
    // crash mid-build reads as absent (same discipline as DedupIndex);
    // stale generations / legacy layouts cleared for a clean slate
    Files.deleteIfExists(metaPath(dir))
    pruneDirs(dir, keep = Set.empty)
    DedupIndex.build(docs, idCol, textCol, s"$dir/index",
      oracleParity = oracleParity)
    TextDedup.nearDuplicatePairs(docs, idCol, textCol, minJaccard, maxBucket,
        oracleParity)
      .write.mode("overwrite").parquet(s"$dir/g0/pairs")
    writeMeta(dir, 0)
  }

  /** Grow the graph by one accepted batch (ids disjoint from the stored
    * corpus): cross edges against the stored index + the batch's internal
    * edges, then extend the index so the NEXT batch sees this one. */
  def append(batch: DataFrame, idCol: String, textCol: String, dir: String,
             minJaccard: Double = 0.6, maxBucket: Int = 4096,
             oracleParity: Boolean = true): Unit = {
    require(exists(dir), s"no complete PairStore at $dir")
    val cross = DedupIndex.matchBatchPairs(batch, idCol, textCol,
        s"$dir/index", minJaccard, maxBucket, oracleParity)
      .select(least(col("new_id"), col("old_id")).as("id1"),
        greatest(col("new_id"), col("old_id")).as("id2"), col("jac"))
    val internal = TextDedup.nearDuplicatePairs(batch, idCol, textCol,
      minJaccard, maxBucket, oracleParity)
    cross.unionByName(internal).write.mode("append")
      .parquet(s"${currentGenDir(dir)}/pairs")
    DedupIndex.append(batch, idCol, textCol, s"$dir/index", oracleParity)
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
                  oracleParity: Boolean = true): Unit = {
    require(exists(dir), s"no complete PairStore at $dir")
    TextDedup.nearDuplicatePairs(batch, idCol, textCol, minJaccard,
        maxBucket, oracleParity)
      .write.mode("append").parquet(s"${currentGenDir(dir)}/pairs")
    DedupIndex.append(batch, idCol, textCol, s"$dir/index", oracleParity)
  }

  /** Compact the store: consolidate the pairs table's accumulated
    * per-append task files into the NEXT generation (~`pairFiles` files)
    * and compact the embedded [[DedupIndex]] (its own generation
    * discipline). The pairs pointer swings atomically after the new
    * generation is fully materialized; the replaced generation is
    * retained for in-flight readers until the following compaction. Edges
    * are preserved exactly — [[graft.PairStoreSpec]] asserts the stored
    * graph bit-identical before and after. */
  def compact(spark: SparkSession, dir: String, pairFiles: Int = 4): Unit = {
    val g = readGen(dir).getOrElse(sys.error(s"no complete PairStore at $dir"))
    require(exists(dir), s"no complete PairStore at $dir")
    val next = g + 1
    pruneDirs(dir, keep = Set(g, g - 1))
    spark.read.parquet(s"$dir/g$g/pairs").repartition(pairFiles)
      .write.mode("overwrite").parquet(s"$dir/g$next/pairs")
    writeMeta(dir, next)
    pruneDirs(dir, keep = Set(g, next))
    DedupIndex.compact(spark, s"$dir/index")
  }

  /** The stored pair graph: (id1, id2, jac), id1 < id2, exact floored
    * trigram Jaccard >= the build/append threshold. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${currentGenDir(dir)}/pairs")
}

package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SttmOps

/** Key-hash-bucketed parquet "current snapshot" table — the engine's
  * stand-in for Flink's PRIMARY KEY + changelog.mode=upsert XREF table
  * (resources/sql/xref-queries.sql:13-23; SURVEY §2 A2/T2), shaped like a
  * Delta/Iceberg MERGE: each micro-batch rewrites ONLY the hash buckets
  * containing the batch's keys, so per-batch write cost is
  * O(|batch| + |touched buckets|), not O(|snapshot|).
  *
  * Layout: `root/g<gen>/_bucket=<b>/part-*.parquet` data directories plus a
  * `_CURRENT` manifest (`bucket:relative/path` lines) naming each bucket's
  * live directory. A merge writes generation g+1 for the touched buckets and
  * atomically swings the manifest; untouched buckets keep pointing at their
  * old generation — their files are never rewritten (asserted byte-identical
  * in StreamingPipelineSpec). The previous manifest is retained as
  * `_PREVIOUS` and its generations are kept on disk, so a reader holding the
  * old manifest never observes missing files; anything older is pruned.
  *
  * Scale note: the per-bucket merge is latest-by-key over
  * (old bucket rows ∪ batch rows) — max_by partial aggregation, shuffle
  * carries ~|keys in touched buckets| rows. The touched-bucket list is a
  * `collect()` of at most `nBuckets` small values (bounded by construction,
  * not by data volume), which is the manifest bookkeeping, not a data path.
  */
final class SnapshotStore(root: String, nBuckets: Int = 16) {

  private val BucketCol = "_bucket"
  private val rootPath = Paths.get(root)
  private val pointer = rootPath.resolve("_CURRENT")
  private val prevPointer = rootPath.resolve("_PREVIOUS")
  private val metaPath = rootPath.resolve("_META")

  /** Bucket count is part of the on-disk layout: it is persisted on first
    * merge and the PERSISTED value wins on reopen — reopening an existing
    * store with a different constructor value would otherwise re-hash keys
    * into different buckets and silently split/lose rows. */
  private def effectiveBuckets: Int =
    if (Files.exists(metaPath))
      Files.readString(metaPath).trim.stripPrefix("nBuckets=").toInt
    else nBuckets

  /** bucket -> live relative data dir, e.g. 3 -> "g2/_bucket=3". */
  private def manifest: Map[Int, String] =
    if (!Files.exists(pointer)) Map.empty
    else Files.readString(pointer).linesIterator.filter(_.nonEmpty).map { l =>
      val Array(b, p) = l.split(":", 2)
      b.toInt -> p
    }.toMap

  /** Current snapshot, or None before the first commit. */
  def read(spark: SparkSession): Option[DataFrame] = {
    val m = manifest
    if (m.isEmpty) None
    else readPaths(spark, m.toSeq)
  }

  /** The snapshot restricted to the given hash buckets — the file-pruned
    * read for per-batch serving: a batch that touched k of n buckets joins
    * against k buckets' files, not the whole snapshot (VERDICT r9 #3; the
    * DedupIndex pfx-pruning discipline applied to the XREF store). */
  def readBuckets(spark: SparkSession, buckets: Seq[Int]): Option[DataFrame] = {
    val want = buckets.toSet
    val sel = manifest.filter { case (b, _) => want(b) }
    if (sel.isEmpty) None
    else readPaths(spark, sel.toSeq)
  }

  private def readPaths(spark: SparkSession,
                        m: Seq[(Int, String)]): Option[DataFrame] = {
    // leaf dirs are passed directly: partition discovery roots at each
    // path, so the _bucket=N segment never surfaces as a column
    val paths = m.sortBy(_._1)
      .map { case (_, rel) => rootPath.resolve(rel).toString }
    Some(spark.read.parquet(paths: _*))
  }

  private def bucketOf(keys: Seq[String], buckets: Int) =
    pmod(hash(keys.map(col): _*), lit(buckets))

  /** Upsert `batch` into the snapshot: latest-by-key over
    * (old rows ∪ batch rows), computed and rewritten ONLY for the hash
    * buckets the batch touches. `order` must rank each key uniquely
    * (ts + seq tie-break), exactly as in [[SttmOps.latestByKey]].
    *
    * @return the touched bucket ids (empty for an all-filtered batch) —
    *         feed these to [[readBuckets]] for a pruned post-merge read.
    */
  def merge(batch: DataFrame, keys: Seq[String], order: Seq[String]): Seq[Int] =
    mergePrepared(prepare(batch, keys), keys, order)

  /** Bucket-tag and materialize a batch for [[mergePrepared]]. Exposed so a
    * caller that needs the batch materialized anyway (StreamingPipeline
    * feeds it to three sinks) pays ONE localCheckpoint instead of two. */
  private[streaming] def prepare(batch: DataFrame, keys: Seq[String]): DataFrame = {
    Files.createDirectories(rootPath)
    if (!Files.exists(metaPath))
      Files.writeString(metaPath, s"nBuckets=$nBuckets")
    // Materialize the batch ONCE: `touched` (first action) and the merged
    // write (second action) MUST observe the same rows. Without this, a
    // non-deterministic or retried input frame re-evaluates per action and
    // can write rows into a g<gen>/_bucket=X directory the manifest never
    // points at — silent row loss.
    batch.withColumn(BucketCol, bucketOf(keys, effectiveBuckets))
      .localCheckpoint()
  }

  /** [[prepare]]'s counterpart: the column [[prepare]] added, for callers
    * that project it away before reusing the materialized frame. */
  private[streaming] def bucketCol: String = BucketCol

  private[streaming] def mergePrepared(
      b: DataFrame, keys: Seq[String], order: Seq[String]): Seq[Int] = {
    val buckets = effectiveBuckets
    val spark = b.sparkSession
    val m = manifest
    val touched = b.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return Seq.empty
    val touchedSet = touched.toSet
    val oldPaths = m.collect {
      case (bk, rel) if touchedSet(bk) => rootPath.resolve(rel).toString
    }.toSeq
    val unioned =
      if (oldPaths.isEmpty) b
      else spark.read.parquet(oldPaths: _*)
        .withColumn(BucketCol, bucketOf(keys, buckets))
        .unionByName(b)
    val merged = SttmOps.latestByKey(unioned, keys, order)
    val gen = 1 + m.values
      .flatMap(_.split("/").headOption)
      .collect { case g if g.startsWith("g") => g.drop(1).toInt }
      .maxOption.getOrElse(-1)
    // Overwrite: a crash between a generation write and the pointer swing
    // leaves an orphan g<gen> dir that the next merge must be able to
    // replace, or the store would brick on "path already exists".
    merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(rootPath.resolve(s"g$gen").toString)
    val next = m ++ touched.map(bk => bk -> s"g$gen/$BucketCol=$bk")
    swingPointer(next, m)
    prune(next, m)
    touched.toSeq
  }

  /** Write the new manifest atomically, retaining the replaced one. */
  private def swingPointer(next: Map[Int, String], prev: Map[Int, String]): Unit = {
    val render = (mm: Map[Int, String]) =>
      mm.toSeq.sortBy(_._1).map { case (bk, p) => s"$bk:$p" }.mkString("\n")
    if (prev.nonEmpty) {
      val tmpPrev = rootPath.resolve("_PREVIOUS.tmp")
      Files.writeString(tmpPrev, render(prev))
      Files.move(tmpPrev, prevPointer, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    val tmp = rootPath.resolve("_CURRENT.tmp")
    Files.writeString(tmp, render(next))
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Drop generation dirs referenced by neither the current nor the
    * previous manifest (two-manifest retention for in-flight readers). */
  private def listDir(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private def prune(cur: Map[Int, String], prev: Map[Int, String]): Unit = {
    val live: Set[String] =
      (cur.values ++ prev.values).flatMap(_.split("/").headOption).toSet
    listDir(rootPath)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("g"))
      .filterNot(p => live(p.getFileName.toString))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

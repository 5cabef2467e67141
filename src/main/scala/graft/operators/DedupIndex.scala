package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persistent near-dup corpus index — the maintained artifact behind
  * [[TextDedup.incrementalDedupAgainst]] and the streaming near-dup gate.
  *
  * At 100 TB the existing corpus's minhash band index and shingle arrays
  * must be a STORED table appended per ingestion batch, not a per-batch
  * recompute (the reference's XREF tables apply the same incremental-
  * snapshot discipline to keyed upserts —
  * resources/architecture/sttm-requirements.md:115-134). This store is the
  * simplest durable form of that: two append-only parquet tables under one
  * root,
  *
  *   `<dir>/shingles`  (id, sh)           — sorted distinct 3-gram hashes
  *   `<dir>/bands`     (id, band, bucket) — 4 banded minhash rows per doc
  *
  * written once at corpus build ([[build]]) and extended per accepted batch
  * ([[append]]) with ONE signature pass over the batch — the existing
  * corpus is never re-read to update its own index. [[matchBatch]] then
  * runs the incremental-dedup match purely against the stored tables; its
  * per-batch plan semi-joins the band index down to the buckets the batch
  * touches before any shuffle, so batch cost tracks the batch, not the
  * corpus (IncrIndexSpec times this at two corpus sizes).
  *
  * Production hardening note: appends are atomic per parquet task file but
  * there is no manifest generation/rollback here — pair with
  * [[graft.streaming.SnapshotStore]]'s manifest discipline if readers race
  * writers. A cluster deployment would also `bucketBy(bucket)` the bands
  * table so the per-batch semi-join prunes at the file level.
  */
object DedupIndex {

  /** Create (overwrite) the index for `docs` under `dir`. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            oracleParity: Boolean = true): Unit =
    write(docs, idCol, textCol, dir, "overwrite", oracleParity)

  /** Extend the index with an accepted batch — one signature pass over the
    * batch only. Ids must be new (disjoint from the stored corpus). */
  def append(docs: DataFrame, idCol: String, textCol: String, dir: String,
             oracleParity: Boolean = true): Unit =
    write(docs, idCol, textCol, dir, "append", oracleParity)

  private def write(docs: DataFrame, idCol: String, textCol: String,
                    dir: String, mode: String, oracleParity: Boolean): Unit = {
    val sh = TextDedup.sortedShingleHashes(docs, idCol, textCol,
      oracleParity = oracleParity)
    sh.write.mode(mode).parquet(s"$dir/shingles")
    TextDedup.bandedFromShingles(sh, idCol)
      .write.mode(mode).parquet(s"$dir/bands")
  }

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/bands/_SUCCESS")) &&
      Files.exists(Paths.get(s"$dir/shingles/_SUCCESS"))

  def shingles(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/shingles")

  def bands(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/bands")

  /** Match `incoming` against the STORED corpus index: one row per
    * incoming doc, (new_id, match_id, jac, is_dup) — exactly
    * [[TextDedup.incrementalDedup]]'s contract, with the existing side
    * read from parquet instead of recomputed. The incoming frame is the
    * only side hashed. */
  def matchBatch(incoming: DataFrame, idCol: String, textCol: String,
                 dir: String, minJaccard: Double = 0.6,
                 maxBucket: Int = 4096,
                 oracleParity: Boolean = true): DataFrame = {
    val spark = incoming.sparkSession
    TextDedup.incrementalDedupAgainst(
      shingles(spark, dir).select(col(idCol), col("sh")),
      bands(spark, dir).select(col(idCol), col("band"), col("bucket")),
      incoming, idCol, textCol, minJaccard, maxBucket, oracleParity)
  }
}

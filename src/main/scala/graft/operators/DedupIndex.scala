package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

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
  *   `<dir>/shingles`           (id, sh)           — sorted 3-gram hashes
  *   `<dir>/bands/pfx=<p>/...`  (id, band, bucket) — 4 banded rows per doc
  *
  * written once at corpus build ([[build]]) and extended per accepted batch
  * ([[append]]) with ONE signature pass over the batch — the existing
  * corpus is never re-read to update its own index.
  *
  * FILE-LEVEL PRUNING: the bands table is laid out in `nPfx` directory
  * partitions keyed by `pfx = pmod(hash(bucket), nPfx)` — the path-based
  * equivalent of `bucketBy(bucket)` (which Spark only supports through a
  * metastore table). [[matchBatch]] first computes the batch's band
  * signature, collects its distinct pfx values (a metadata-scale collect,
  * bounded by nPfx, like [[graft.streaming.SnapshotStore]]'s touched-bucket
  * list), and reads ONLY those partitions: Catalyst's static partition
  * pruning skips every file of an untouched pfx, cutting the stored-side
  * scan to the touched fraction of the index (≈ touched/nPfx of its
  * files; each partition still grows with the corpus, so size nPfx for
  * the target scale — [[graft.IncrIndexSpec]] asserts the scanned-file
  * count tracks the touched partitions). The exact
  * (band, bucket) semi-join inside [[TextDedup.incrementalDedupPrepared]]
  * then prunes within the surviving partitions; pfx pruning is a strict
  * superset filter of that semi-join, so match results are bit-identical
  * with or without it.
  *
  * LAYOUT MANIFEST: `nPfx` is part of the on-disk layout, so it is
  * persisted to `<dir>/_META` when the store is created and the PERSISTED
  * value wins thereafter (same discipline as SnapshotStore's bucket
  * count — appending with a different constructor value would scatter the
  * same bucket across different pfx partitions and quietly break pruning).
  * `_META` is written AFTER the initial data lands, so it doubles as the
  * build-completion marker: a crash mid-build leaves no `_META` and
  * [[exists]] reports the store absent.
  *
  * Production hardening note: appends are atomic per parquet task file but
  * there is no manifest generation/rollback for DATA files — pair with
  * [[graft.streaming.SnapshotStore]]'s generation discipline if readers
  * race writers.
  */
object DedupIndex {

  val DefaultPfx = 64

  private def metaPath(dir: String) = Paths.get(s"$dir/_META")

  private def pfxOf(nPfx: Int) = pmod(hash(col("bucket")), lit(nPfx))

  /** The persisted partition-prefix count of an existing store. */
  def numPfx(dir: String): Int =
    Files.readString(metaPath(dir)).trim.stripPrefix("nPfx=").toInt

  /** Create (overwrite) the index for `docs` under `dir`. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            oracleParity: Boolean = true, nPfx: Int = DefaultPfx): Unit = {
    require(nPfx > 0, s"nPfx must be positive, got $nPfx")
    // REBUILD window: when overwriting an existing store, drop its _META
    // before touching data. A crash between the shingles overwrite and the
    // bands overwrite would otherwise leave new shingles + old bands under
    // a still-present completion marker — exists() true, silently wrong
    // matches. With _META gone first, any partial rebuild reads as absent.
    Files.deleteIfExists(metaPath(dir))
    write(docs, idCol, textCol, dir, "overwrite", oracleParity, nPfx)
    Files.createDirectories(Paths.get(dir))
    Files.writeString(metaPath(dir), s"nPfx=$nPfx")
  }

  /** Extend the index with an accepted batch — one signature pass over the
    * batch only. Ids must be new (disjoint from the stored corpus). The
    * batch's band rows land in the layout's existing pfx partitions. */
  def append(docs: DataFrame, idCol: String, textCol: String, dir: String,
             oracleParity: Boolean = true): Unit =
    write(docs, idCol, textCol, dir, "append", oracleParity, numPfx(dir))

  private def write(docs: DataFrame, idCol: String, textCol: String,
                    dir: String, mode: String, oracleParity: Boolean,
                    nPfx: Int): Unit = {
    val sh = TextDedup.sortedShingleHashes(docs, idCol, textCol,
      oracleParity = oracleParity)
    sh.write.mode(mode).parquet(s"$dir/shingles")
    TextDedup.bandedFromShingles(sh, idCol)
      .withColumn("pfx", pfxOf(nPfx))
      .write.mode(mode).partitionBy("pfx").parquet(s"$dir/bands")
  }

  def exists(dir: String): Boolean =
    Files.exists(metaPath(dir)) &&
      Files.exists(Paths.get(s"$dir/bands/_SUCCESS")) &&
      Files.exists(Paths.get(s"$dir/shingles/_SUCCESS"))

  /** Compact the store in place: every [[append]] adds its own task files
    * to each touched pfx partition, so after N batches a partition holds
    * O(N) small files and [[matchBatch]]'s pruned read degrades from
    * "few files per touched pfx" to "N files per touched pfx" — the
    * classic small-file decay of any append-only table. Compaction
    * rewrites the bands table to ~one file per pfx partition and the
    * shingles table to `shingleFiles` files (size it to the target file
    * size at the deployment's corpus scale), preserving rows and layout
    * exactly — match results are bit-identical before and after
    * ([[graft.IncrIndexSpec]] asserts both the equality and the file
    * counts).
    *
    * Crash discipline = [[build]]'s rebuild window: `_META` is dropped
    * before any data move and restored only after both swaps complete, so
    * a crash mid-compaction leaves the store reading as ABSENT (rebuild
    * required) rather than silently half-compacted. Readers racing the
    * compaction need the SnapshotStore generation discipline (class doc). */
  def compact(spark: SparkSession, dir: String, shingleFiles: Int = 8): Unit = {
    require(exists(dir), s"no complete DedupIndex at $dir")
    val nPfx = numPfx(dir)
    // Rewrite into sibling tmp dirs first — the store stays intact until
    // both rewrites are fully materialized.
    bands(spark, dir)
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(s"$dir/bands_tmp")
    shingles(spark, dir)
      .repartition(shingleFiles)
      .write.mode("overwrite").parquet(s"$dir/shingles_tmp")
    Files.deleteIfExists(metaPath(dir)) // store now reads as absent
    def swap(name: String): Unit = {
      val cur = Paths.get(s"$dir/$name"); val old = Paths.get(s"$dir/${name}_old")
      Files.move(cur, old)
      Files.move(Paths.get(s"$dir/${name}_tmp"), cur)
      // delete children before parents
      val walk = Files.walk(old)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
    swap("bands")
    swap("shingles")
    Files.writeString(metaPath(dir), s"nPfx=$nPfx")
  }

  def shingles(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/shingles")

  /** The stored band index, pfx partition column included. */
  def bands(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/bands")

  /** Match `incoming` against the STORED corpus index: one row per
    * incoming doc, (new_id, match_id, jac, is_dup) — exactly
    * [[TextDedup.incrementalDedup]]'s contract, with the existing side
    * read from parquet instead of recomputed. The incoming frame is the
    * only side hashed; the stored bands read is pruned to the pfx
    * partitions the batch's buckets hash into (see class doc). */
  def matchBatch(incoming: DataFrame, idCol: String, textCol: String,
                 dir: String, minJaccard: Double = 0.6,
                 maxBucket: Int = 4096,
                 oracleParity: Boolean = true): DataFrame = {
    val spark = incoming.sparkSession
    val shI = TextDedup.sortedShingleHashes(incoming, idCol, textCol,
      oracleParity = oracleParity)
    val bi = TextDedup.bandedFromShingles(shI, idCol)
    val nPfx = numPfx(dir)
    // Metadata-scale collect: at most nPfx small ints, off a band frame
    // bandedFromShingles already materialized.
    val touched = bi.select(pfxOf(nPfx).as("pfx")).distinct()
      .collect().map(_.getInt(0))
    val be = bands(spark, dir)
      .filter(col("pfx").isin(touched.map(Integer.valueOf): _*))
      .select(col(idCol), col("band"), col("bucket"))
    TextDedup.incrementalDedupPrepared(
      shingles(spark, dir).select(col(idCol), col("sh")),
      be, incoming, shI, bi, idCol, minJaccard, maxBucket)
  }
}

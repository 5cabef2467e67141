package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet "current snapshot" table — the engine's stand-in for
  * Flink's PRIMARY KEY + changelog.mode=upsert XREF table
  * (resources/sql/xref-queries.sql:13-23; SURVEY §2 A2/T2).
  *
  * Writes alternate between `v0`/`v1` subdirectories with a `_CURRENT`
  * pointer file, so readers never observe a half-written snapshot and the
  * previous version stays readable during the swap (no read-modify-overwrite
  * race on a single directory).
  *
  * Scale note: the merge is latest-by-key over (old snapshot ∪ new batch) —
  * one hash-partitioned aggregation whose shuffle carries ~|keys| rows
  * thanks to max_by partial aggregation; the snapshot itself would be a
  * partitioned/bucketed table (or Delta/Iceberg MERGE) on a real cluster,
  * which this interface abstracts.
  */
final class SnapshotStore(root: String) {

  private val rootPath = Paths.get(root)
  private val pointer = rootPath.resolve("_CURRENT")

  private def currentVersion: Option[String] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim).filter(_.nonEmpty)
    else None

  /** Current snapshot, or None before the first commit. */
  def read(spark: SparkSession): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(rootPath.resolve(v).toString))

  /** Replace the snapshot with `df` (writes the inactive version, then
    * atomically swings the pointer). */
  def write(df: DataFrame): Unit = {
    Files.createDirectories(rootPath)
    val next = if (currentVersion.contains("v0")) "v1" else "v0"
    df.write.mode(SaveMode.Overwrite).parquet(rootPath.resolve(next).toString)
    val tmp = rootPath.resolve("_CURRENT.tmp")
    Files.writeString(tmp, next)
    Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained corpus statistics.
  *
  * At 100 TB the corpus report (docs/tokens/length extremes/quality mix
  * per source) cannot be a full rescan every time a batch lands — the
  * same discipline as [[DedupIndex]]: the statistics live as a MAINTAINED
  * ARTIFACT, updated per ingested batch at the batch's own cost, and the
  * report reads only the artifact. The trick is restricting the stats to
  * MERGEABLE algebra — counts, sums, mins, maxes — kept as raw partials
  * (never pre-divided ratios, which don't merge); derived ratios are
  * computed at report time from the merged sums, so the incremental
  * report is bit-identical to a from-scratch full-corpus aggregate
  * (pinned by [[graft.IncrStatsSpec]] and the q_incr_stats oracle).
  *
  * Scale shape: each append is ONE map-side-combining partial aggregate
  * over the batch (emitting <= #sources rows), appended to a parquet
  * store whose size is O(#sources x #batches); the report merges the
  * store with a second tiny aggregate. Per-batch cost is independent of
  * corpus size — the property [[graft.IncrStatsSpec]] asserts by growing
  * the store and re-timing a fixed batch.
  */
object IncrStats {

  private val stopWords = Seq("the", "a", "and", "of", "to", "in")

  /** One mergeable partial-stats row per source for `docs`: doc/token
    * counts, token-length extremes, and the raw stop-word token sum
    * (ratio numerator — divided only at report time). */
  def partial(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("source"), size(toks).cast("long").as("_nt"),
        size(filter(toks, t => t.isin(stopWords.map(lit): _*)))
          .cast("long").as("_ns"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"),
        min(col("_nt")).as("min_tok"), max(col("_nt")).as("max_tok"),
        sum(col("_ns")).as("stop_sum"))
  }

  /** Create (overwrite) the stats store for `docs` under `dir`. */
  def build(docs: DataFrame, dir: String): Unit =
    partial(docs).write.mode("overwrite").parquet(s"$dir/partials")

  /** Fold one ingested batch into the store — one partial aggregate over
    * the batch only; the existing store is never re-read or rewritten. */
  def append(docs: DataFrame, dir: String): Unit =
    partial(docs).write.mode("append").parquet(s"$dir/partials")

  /** Stamp the store as fully composed. A store is typically build() plus
    * several append()s; checking `partials/_SUCCESS` would declare it
    * complete after the FIRST write, so a crash mid-composition would
    * leave a partial store that every later `exists` check silently
    * reuses. Callers write this marker once the last append has landed,
    * and `exists` trusts only the marker. */
  def markComplete(dir: String): Unit =
    Files.writeString(Paths.get(s"$dir/COMPLETE"), "complete\n")

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/COMPLETE"))

  /** Merged per-source report from the stored partials: the same schema a
    * full-corpus aggregate would produce, plus the report-time stop-word
    * ratio in basis points (exact integer division of the merged sums). */
  def report(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/partials")
      .groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("min_tok")).as("min_tok"), max(col("max_tok")).as("max_tok"),
        sum(col("stop_sum")).as("stop_sum"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("min_tok"),
        col("max_tok"),
        expr("stop_sum * 10000 div n_tokens").as("stop_bp"))
}

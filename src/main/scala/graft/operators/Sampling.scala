package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here is hash-based, NOT random: the md5-derived
  * [[TextDedup.stableHash]] of the record id decides membership, so splits
  * are (a) reproducible run-to-run and engine-to-engine (the DuckDB oracle
  * computes the identical bucket), (b) stable under re-partitioning and
  * re-ordering of the input, and (c) consistent across incremental loads —
  * a document keeps its split forever, the property a train/val/test
  * separation actually needs (Spark's `sample()`/`randomSplit()` guarantee
  * none of these).
  *
  * Scale: pure projection + filter — no shuffle, no state; at 100 TB these
  * run at scan speed inside whole-stage codegen.
  */
object Sampling {

  /** Deterministic bucket in [0, 10000) from the id column. */
  def hashBucket(id: Column): Column =
    pmod(TextDedup.stableHash(id.cast("string")), lit(10000L))

  /** Reproducible named split (e.g. train/val/test): cumulative weight
    * thresholds over the hash bucket. Weights must sum to 1 (the whole
    * corpus is assigned); rows past the second-to-last threshold get the
    * last split name, so 0.8/0.1/0.1 is exact. Thresholds are rounded to
    * the nearest bucket — truncation would misplace boundary buckets for
    * fractions like 0.57 (0.57*10000 = 5699.999...). */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val bucket = hashBucket(col(idCol))
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail.map(w => math.round(w * 10000))
    val expr = splits.init.zip(thresholds.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), acc) => when(bucket < cum, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic shard assignment for corpus export: shard =
    * stableHash(id) mod nShards. Like the splits, a document's shard never
    * changes across runs, engines, or incremental loads — the property a
    * resumable multi-file export needs. Pure projection. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard",
      pmod(TextDedup.stableHash(col(idCol).cast("string")), lit(nShards.toLong)))

  /** Per-shard manifest for a sharded export: document count, total token
    * count and the id range per shard — the numbers a downstream loader
    * checks before trusting the export. One hash aggregation. */
  def shardStats(df: DataFrame, idCol: String, textCol: String,
                 nShards: Int): DataFrame =
    shardAssign(df, idCol, nShards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tok_total"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Physical sharded export: write `df` under `path` partitioned by the
    * deterministic shard, capping rows per file so downstream loaders get
    * bounded, parallel-friendly files. Layout: `path/shard=N/part-*.parquet`.
    * Because the shard is a pure function of the id, re-exporting after an
    * incremental load appends only to the affected shards' directories. */
  def exportShards(df: DataFrame, idCol: String, nShards: Int, path: String,
                   maxRecordsPerFile: Int = 1000000): Unit =
    shardAssign(df, idCol, nShards)
      .repartition(col("shard"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      // Dynamic overwrite replaces only the shard directories present in
      // `df` — without it Spark's static mode deletes the whole `path`,
      // breaking the incremental re-export contract documented above.
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(path)

  /** Training-mix token-budget planner: given per-source target weights
    * (exact integer parts of a whole) and a global token budget, emit the
    * plan a mixture-sampling stage executes — per source: available
    * docs/tokens, the budget slice floor(weight * budget / weightSum), the
    * achievable tokens (capped at available), the sampling fraction in
    * basis points, and whether the source can fill its slice (the signal
    * to re-weight or up-sample elsewhere). Sources absent from `weights`
    * get weight 0 and stay in the report.
    *
    * All arithmetic is exact integers (weights as parts, fractions in
    * basis points via integer division) so the plan is reproducible across
    * engines and runs. Scale shape: one partial-agg shuffle on source;
    * the weight table rides as a literal CASE; output is O(#sources). The
    * plan's `sample_bp` feeds [[stratifiedSample]]'s per-stratum fractions
    * directly (same basis-point convention), giving the deterministic,
    * nested-by-construction sampling the mix executes with. */
  def mixPlan(df: DataFrame, sourceCol: String, textCol: String,
              weights: Map[String, Long], budgetTokens: Long): DataFrame = {
    val wsum = weights.values.sum
    require(wsum > 0, "mixPlan needs a positive total weight")
    val wCol = weights.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((s, w), acc) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    df.select(col(sourceCol), size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("avail_tok"))
      .withColumn("weight", wCol)
      // decimal(38,0) product: weight x budget overflows int64 at
      // production scales (1e4 x 1e15 > 2^63); the div-by-wsum result is
      // <= budget and folds back to BIGINT exactly (ADVICE r08)
      .withColumn("_num", col("weight").cast("decimal(38,0)") * lit(budgetTokens))
      .withColumn("target_tok", expr(s"CAST(_num div $wsum AS BIGINT)"))
      .withColumn("plan_tok", least(col("avail_tok"), col("target_tok")))
      .withColumn("sample_bp",
        when(col("avail_tok") > 0, expr("(plan_tok * 10000) div avail_tok"))
          .otherwise(lit(0L)))
      .withColumn("fillable", col("avail_tok") >= col("target_tok"))
      .drop("_num")
  }

  /** Temperature-scaled mixture plan (mT5/XLM-R-style low-resource
    * upweighting): instead of caller-supplied weights, each source's
    * weight is avail_tok^(1/2) — temperature sampling with alpha = 1/2,
    * which flattens the source distribution so small sources keep
    * representation. The exponent is computed as floor(sqrt(avail_tok))
    * — IEEE sqrt is correctly rounded in every engine, the bigint fits a
    * double exactly below 2^53, and everything after the floor is exact
    * integer arithmetic, so the plan is bit-reproducible across engines
    * (the repo-wide oracle-parity rule; a float p_s^alpha share would
    * depend on summation order).
    *
    * Scale shape: one partial-agg shuffle on source; the weight
    * normalizer is a broadcast 1-row aggregate over the O(#sources)
    * stats table (allowlisted cross); output columns follow [[mixPlan]]
    * (sample_bp feeds [[applyMixPlan]]/[[stratifiedSample]] unchanged). */
  def temperatureMixPlan(df: DataFrame, sourceCol: String, textCol: String,
                         budgetTokens: Long): DataFrame = {
    val stats = df
      .select(col(sourceCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("avail_tok"))
      .withColumn("weight",
        floor(sqrt(col("avail_tok").cast("double"))).cast("long"))
    stats.crossJoin(broadcast(stats.agg(sum("weight").as("wsum"))))
      .withColumn("target_tok",
        // decimal(38,0) product: sqrt-weights reach ~3e9, so weight x
        // budget overflows int64 well before production budgets; the
        // divided result is <= budget and folds back exactly (ADVICE r08)
        expr(s"CAST((CAST(weight AS DECIMAL(38,0)) * $budgetTokens) div wsum" +
          " AS BIGINT)"))
      .withColumn("plan_tok", least(col("avail_tok"), col("target_tok")))
      .withColumn("sample_bp",
        when(col("avail_tok") > 0, expr("(plan_tok * 10000) div avail_tok"))
          .otherwise(lit(0L)))
      .withColumn("fillable", col("avail_tok") >= col("target_tok"))
      .drop("wsum")
  }

  /** [[mixPlan]] WITHOUT the one-epoch cap — the standard LLM data mix
    * (GPT-3 / LLaMA style), where scarce high-quality sources repeat for
    * multiple training epochs: a source whose token target exceeds its
    * availability gets `full_epochs` whole passes plus a
    * `rem_bp`/10000 hash-sampled partial pass (mixPlan marks such sources
    * `fillable = false` and silently caps them at 1.0 epoch — the right
    * report when repetition is banned, the wrong mix when it isn't).
    * Same exact-integer discipline: target = weight*budget div wsum,
    * full_epochs = target div avail, rem_bp = (target mod avail)*10000
    * div avail — reproducible across engines, one partial-agg shuffle,
    * O(#sources) output. [[epochExpand]] executes the plan. */
  def upsampledMixPlan(df: DataFrame, sourceCol: String, textCol: String,
                       weights: Map[String, Long],
                       budgetTokens: Long): DataFrame = {
    val wsum = weights.values.sum
    require(wsum > 0, "upsampledMixPlan needs a positive total weight")
    val wCol = weights.toSeq.sortBy(_._1).foldRight(lit(0L): Column) {
      case ((s, w), acc) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    df.select(col(sourceCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("avail_tok"))
      .withColumn("weight", wCol)
      // same int64-overflow headroom as mixPlan's product (ADVICE r08)
      .withColumn("_num", col("weight").cast("decimal(38,0)") * lit(budgetTokens))
      .withColumn("target_tok", expr(s"CAST(_num div $wsum AS BIGINT)"))
      .withColumn("full_epochs",
        when(col("avail_tok") > 0, expr("target_tok div avail_tok"))
          .otherwise(lit(0L)))
      .withColumn("rem_bp",
        when(col("avail_tok") > 0,
          expr("((target_tok % avail_tok) * 10000) div avail_tok"))
          .otherwise(lit(0L)))
      .drop("_num")
  }

  /** Execute an [[upsampledMixPlan]]: each doc appears once per full
    * epoch of its source plus once more in the partial epoch iff its hash
    * bucket clears `rem_bp` — output (id, source, epoch), epoch 0-based,
    * total tokens ≈ the plan targets. The partial pass rides the SAME id
    * hash as [[stratifiedSample]]/[[applyMixPlan]], so a mix re-planned
    * with a lower budget selects a nested subset per epoch.
    *
    * Scale shape: broadcast O(#sources) plan + one generate — ZERO
    * shuffles; output size is the training budget, which is the point.
    * Epoch counts are per-source plan values, so a degenerate
    * weight/budget pair (one tiny source owed the whole budget) fans out
    * proportionally — sanity-check the plan's `full_epochs` before
    * executing at scale. */
  def epochExpand(df: DataFrame, idCol: String, sourceCol: String,
                  plan: DataFrame): DataFrame =
    df.join(broadcast(plan
        .select(col(sourceCol), col("full_epochs"), col("rem_bp"))),
        Seq(sourceCol))
      .select(col(idCol), col(sourceCol), col("full_epochs"), col("rem_bp"),
        explode(sequence(lit(0L), col("full_epochs"))).as("epoch"))
      .filter(col("epoch") < col("full_epochs") ||
        hashBucket(col(idCol)) < col("rem_bp"))
      .select(col(idCol), col(sourceCol), col("epoch"))

  /** Execute a [[mixPlan]]: keep each doc iff its hash bucket falls below
    * its source's `sample_bp`. The plan is O(#sources) so it broadcasts;
    * the corpus side is a pure projection + filter (scan-speed at 100 TB),
    * and because the bucket is the same id hash [[stratifiedSample]] uses,
    * successive plans with lower fractions select nested subsets. */
  def applyMixPlan(df: DataFrame, idCol: String, sourceCol: String,
                   plan: DataFrame): DataFrame =
    df.join(broadcast(plan.select(col(sourceCol), col("sample_bp"))),
        Seq(sourceCol))
      .filter(hashBucket(col(idCol)) < col("sample_bp"))

  /** Deterministic training-epoch shuffle: every doc gets a shard and a
    * dense position within that shard, ordered by the md5 hash of
    * (epoch seed, id) — a different but fully reproducible permutation per
    * seed, stable across engines, runs, and input order (Spark's
    * `rand(seed)` is partition-layout-dependent; this is not).
    *
    * Scale shape: no global sort — the ordering window is partitioned by
    * shard (the dataloader's parallel read unit, bounded rows each), which
    * is ONE hash-partitioned exchange; readers consume shards
    * independently. Returns (id, shard, pos). */
  def shuffleOrder(df: DataFrame, idCol: String, nShards: Int,
                   seed: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col(idCol))
    shardAssign(df, idCol, nShards)
      .withColumn("h", TextDedup.stableHash(
        concat_ws("_", lit(seed), col(idCol).cast("string"))))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Frequency cap: keep at most `maxPerGroup` rows per group, chosen by
    * deterministic hash rank — the domain-balancing step web-corpus
    * curation applies so no single host/source dominates the mix
    * (RefinedWeb-style per-domain caps). Which rows survive is a pure
    * function of (seed, id): reproducible across engines, runs, input
    * order, and — unlike a LIMIT per group — unchanged when other rows of
    * the group are added or removed BELOW the survivor's rank.
    *
    * Scale shape: one window partitioned by the group column (one hash
    * exchange, per-group sort bounded by group size). A group so hot it
    * skews a partition is exactly the group the cap exists to shrink; for
    * pathological single-domain corpora, pre-filter with
    * [[stratifiedSample]] to bound group size before ranking. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  maxPerGroup: Int, seed: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", TextDedup.stableHash(
        concat_ws("_", lit(seed), col(idCol).cast("string"))))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerGroup)
      .drop("_h", "_rk")
  }

  /** Weighted multinomial sampling WITH replacement: `nDraws` draws where
    * P(doc) = weight / total — the temperature/quality-weighted document
    * sampling step of a mixture pipeline (e.g. draws proportional to token
    * count, or to an up-weighting score), where [[applyMixPlan]]'s
    * keep/drop filtering is too coarse. Deterministic end to end: draw i
    * lands at position stableHash(seed, i) mod totalWeight on the
    * concatenated weight line, and the doc owning that interval wins — no
    * RNG, reproducible across engines, runs, and input partitioning.
    *
    * Scale shape (100 TB): the interval table comes from
    * [[Packing.prefixSum]] (two-phase distributed scan — no single-reducer
    * window); the draw-to-interval lookup is the banded-range-join
    * rewrite: positions bucket by `pos div bucketSize`, intervals explode
    * over the (few) buckets they span — total explode volume is
    * ~nBuckets + nDocs rows — and the match is a hash equi-join on the
    * bucket id with the exact containment predicate filtered in-stage.
    * Never a theta join, never a nested loop; the two crossJoins are
    * 1-row total-weight broadcasts. Zero-weight rows are excluded (they
    * own an empty interval). Returns (draw_idx, doc_id, w) — exactly one
    * row per draw, because the intervals partition [0, total). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     nDraws: Int, seed: Long = 0L,
                     nBuckets: Int = 1024): DataFrame = {
    require(nDraws > 0 && nBuckets > 0, "need positive nDraws/nBuckets")
    val spark = df.sparkSession
    // (doc_id, w, lo): each positive-weight doc owns [lo, lo + w).
    // Checkpointed — it feeds the 1-row total AND the lookup join.
    val pref = Packing.prefixSum(df.filter(weightCol > lit(0L)), idCol, weightCol)
      .select(col("doc_id"), col("n").as("w"), col("start").as("lo"))
      .localCheckpoint()
    val tot = pref.agg(max(col("lo") + col("w")).as("tot"))
    val bSize = s"((tot + ${nBuckets - 1}) div $nBuckets)" // ceil(tot/nBuckets)
    val draws = spark.range(nDraws).toDF("draw_idx")
      .crossJoin(broadcast(tot))
      .withColumn("pos", pmod(TextDedup.stableHash(
        concat_ws("_", lit(seed), col("draw_idx").cast("string"))), col("tot")))
      .withColumn("bkt", expr(s"pos div $bSize"))
      .select("draw_idx", "pos", "bkt")
    val spans = pref.crossJoin(broadcast(tot))
      .withColumn("bkt", explode(sequence(
        expr(s"lo div $bSize"), expr(s"(lo + w - 1) div $bSize"))))
      .select(col("doc_id"), col("w"), col("lo"), col("bkt"))
    draws.join(spans, Seq("bkt"))
      .filter(col("pos") >= col("lo") && col("pos") < col("lo") + col("w"))
      .select(col("draw_idx"), col("doc_id"), col("w"))
  }

  /** Deterministic per-stratum subsample: keep a row iff its hash bucket
    * falls below `fractions(stratum) * 10000` (strata absent from the map
    * use `defaultFraction`). The kept subset for a stratum is a superset of
    * the kept subset for any smaller fraction — nested samples for free. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(math.round(defaultFraction * 10000)): Column) {
        case ((stratum, f), acc) =>
          when(col(stratumCol) === stratum, lit(math.round(f * 10000))).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol)) < threshold)
  }

  /** Per-group quantile calibration of a score column: each row gets its
    * WITHIN-GROUP percentile `pct_bp = (rank_min - 1) * 10000 div
    * max(n - 1, 1)` (rank_min = SQL `rank()`, ties share a value; a
    * single-row group calibrates to 0). Selection thresholds applied to
    * `pct_bp` are then comparable ACROSS sources — the standard fix when
    * per-source quality scores have incompatible raw scales (one crawl's
    * "good" is another's median), feeding [[Selection.selectByBudget]] or
    * a fixed-percentile gate.
    *
    * Scale shape: the rank is NOT a corpus-sized window. Rows collapse to
    * the per-(group, score) histogram first (one partial-agg shuffle);
    * the only window runs over that histogram, partitioned by group and
    * bounded by the group's DISTINCT-SCORE count (for integer quality
    * scores: the score range, not the corpus) — the same justification as
    * [[TextAnalysis.lengthPercentileTrim]]'s allowlisted window. Ranks
    * then join back to rows on (group, score): one broadcast-or-shuffle
    * hash join keyed by the histogram key. A corpus-sized window
    * `partitionBy(group)` would funnel each source's whole slice through
    * one task — the skew this construction exists to avoid.
    *
    * Returns the input columns plus `pct_bp` (long). */
  def quantileCalibrate(df: DataFrame, groupCol: String,
                        scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(col(groupCol), scoreCol.cast("long").as("_score"))
      .groupBy(col(groupCol), col("_score")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(groupCol).orderBy("_score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("_below", coalesce(sum("_c").over(w), lit(0L)))
      .withColumn("_n", sum("_c").over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col("_score"),
        expr("(_below * 10000) div greatest(_n - 1, 1)").as("pct_bp"))
    df.withColumn("_score", scoreCol.cast("long"))
      .join(ranked, Seq(groupCol, "_score"))
      .drop("_score")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted data selection: score every raw document by how much it looks
  * like a small curated target corpus.
  *
  * The estimator is DSIR-shaped (Data Selection via Importance Resampling,
  * Xie et al. 2023): featurize text as HASHED token buckets, fit two
  * categorical bucket distributions — target p and raw q, both
  * Laplace-smoothed — and weight each document by the sum over its token
  * occurrences of the bucket importance ratio p_b / q_b. Hashing keeps the
  * parameter table at a fixed `nBuckets` rows no matter the vocabulary, so
  * the learned "model" broadcasts to every executor for free.
  *
  * Two scoring modes, mirroring [[TextAnalysis.bm25Rank]]:
  *  - parity (default): the per-occurrence contribution is the exact
  *    integer `floor(1e6 * (tc_b+1) * R / ((rc_b+1) * T))` with
  *    T = targetTokens + nBuckets and R = rawTokens + nBuckets — every
  *    intermediate a 64-bit integer, so any SQL engine reproduces the score
  *    bit-for-bit. Summing scaled ratios (not logs) keeps it integral; the
  *    per-bucket ranking is identical to the log form because log is
  *    monotone. Headroom: the widest intermediate is 1e6 * tc1 * R, so the
  *    MAX smoothed per-bucket target count times the smoothed raw token
  *    total must stay under 2^63/1e6 ~ 9.2e12 — under bucket skew one hot
  *    bucket alone can blow it long before the average does. Past the
  *    bound Spark wraps longs silently (garbage scores) while other
  *    engines error, so an `assert_true` guard over the nBuckets-row model
  *    fails loudly instead, directing to `logRatio = true`.
  *  - prod (`logRatio = true`): textbook double log-importance
  *    log((tc_b+1)/T) - log((rc_b+1)/R) summed per document — the score the
  *    paper resamples on. No cross-engine oracle (float summation order),
  *    benchmarked rows-only like the xxhash64 twins.
  *
  * Scale shape: one explode pass per corpus feeding a `nBuckets`-row
  * partial aggregation each (map-side combine collapses the shuffle to at
  * most nBuckets rows per task); the joined bucket-score table is tiny by
  * construction and broadcast to the raw-token side; the per-document
  * rollup is one hash aggregation keyed by the document id. Nothing here
  * is quadratic and no window touches the full corpus, so the plan holds
  * at 100 TB — the target corpus is the only side that must stay "small"
  * (it is, by definition: a hand-curated sample).
  *
  * Reference anchor: complements the quality/langid gates the reference's
  * pipelines apply per-row (resources/requirements.txt §quality) with a
  * corpus-relative selection signal.
  */
object Selection {

  /** Per-document importance weight of `raw` against `target`.
    * Output: (idCol, n_tok, dsir_score, mean_score) — parity mode longs, or
    * doubles when `logRatio`.
    *
    * See [[importanceWeightGate]] for the q_dsir_prod consistency-gate
    * companion (one pass emitting the log sum plus BOTH exact-integer
    * parity sums). */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, nBuckets: Int = 4096,
                        logRatio: Boolean = false): DataFrame = {
    val (rawTok, model) = bucketModel(raw, target, idCol, textCol, nBuckets)
    val scored =
      if (logRatio)
        model.select(col("b"),
          (log(col("tc1").cast("double") / col("T")) -
            log(col("rc1").cast("double") / col("R"))).as("score"))
      else {
        // In-plan headroom guard, evaluated on the <= nBuckets model rows
        // only (no extra corpus scan): 1e6 * tc1 * R must fit a long for
        // EVERY bucket. The double-typed check is conservative (9.2e12 <
        // 2^63/1e6) and cannot itself overflow. assert_true yields NULL on
        // success; folding it into the score (+0) keeps Catalyst from
        // pruning the unused guard column.
        val guard = assert_true(
          col("tc1").cast("double") * col("R").cast("double") < 9.2e12,
          lit("DSIR parity-mode headroom exceeded: max per-bucket smoothed " +
            "target count x smoothed raw tokens must stay under ~9.2e12; " +
            "use logRatio = true for corpora this large"))
        model.select(col("b"),
          (expr("(1000000 * tc1 * R) div (rc1 * T)") +
            coalesce(guard.cast("long"), lit(0L))).as("score"))
      }

    val perDoc = rawTok.join(broadcast(scored), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum("score").as("dsir_score"))
    if (logRatio)
      perDoc.withColumn("mean_score", col("dsir_score") / col("n_tok"))
    else
      perDoc.withColumn("mean_score", expr("dsir_score div n_tok"))
  }

  /** One-pass gate companion to [[importanceWeights]] (r13 review: the
    * q_dsir_prod gate first called the operator three times — prod, parity,
    * inverted — re-exploding the corpus for each, when the three per-bucket
    * scores all live on the same <= nBuckets model rows). Emits per doc the
    * production log-sum together with BOTH exact-integer parity sums:
    * (idCol, n_tok, lsum, psum, isum) from one corpus explode + one model
    * build + one broadcast-join aggregation. */
  def importanceWeightGate(raw: DataFrame, target: DataFrame, idCol: String,
                           textCol: String, nBuckets: Int = 4096): DataFrame = {
    val (rawTok, model) = bucketModel(raw, target, idCol, textCol, nBuckets)
    // same headroom guard as parity mode, covering both directions
    val guard = assert_true(
      col("tc1").cast("double") * col("R").cast("double") < 9.2e12 &&
        col("rc1").cast("double") * col("T").cast("double") < 9.2e12,
      lit("DSIR parity-mode headroom exceeded: max per-bucket smoothed " +
        "count x smoothed total must stay under ~9.2e12; " +
        "use logRatio = true for corpora this large"))
    val scored = model.select(col("b"),
      (log(col("tc1").cast("double") / col("T")) -
        log(col("rc1").cast("double") / col("R"))).as("lscore"),
      (expr("(1000000 * tc1 * R) div (rc1 * T)") +
        coalesce(guard.cast("long"), lit(0L))).as("pscore"),
      expr("(1000000 * rc1 * T) div (tc1 * R)").as("iscore"))
    rawTok.join(broadcast(scored), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum("lscore").as("lsum"),
        sum("pscore").as("psum"), sum("iscore").as("isum"))
  }

  /** The shared tokenize -> bucket-count -> smoothed-model scaffolding of
    * [[importanceWeights]] and [[importanceWeightGate]] (r13 review: the
    * gate must validate the SAME model the operator fits — a copy-pasted
    * scaffold could silently diverge under a future smoothing/hash edit).
    * Returns (per-token raw frame with bucket column `b`, the <= nBuckets-
    * row model with tc1/rc1 smoothed counts and T/R smoothed totals). */
  private def bucketModel(raw: DataFrame, target: DataFrame, idCol: String,
                          textCol: String, nBuckets: Int)
      : (DataFrame, DataFrame) = {
    val bucket = pmod(TextDedup.stableHash(col("t")), lit(nBuckets.toLong))
    val rawTok = raw
      .select(col(idCol), explode(split(col(textCol), " ")).as("t"))
      .withColumn("b", bucket).drop("t")
    val tgtTok = target
      .select(explode(split(col(textCol), " ")).as("t"))
      .withColumn("b", bucket).drop("t")
    val tc = tgtTok.groupBy("b").agg(count(lit(1)).as("tc"))
    val rc = rawTok.groupBy("b").agg(count(lit(1)).as("rc"))
    // Smoothed totals: +nBuckets for the +1 on every bucket.
    val tTot = tgtTok.agg((count(lit(1)) + nBuckets).as("T"))
    val rTot = rawTok.agg((count(lit(1)) + nBuckets).as("R"))
    // <= nBuckets rows: the whole fitted model, broadcastable by size.
    val model = rc
      .join(tc, Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .withColumn("tc1", coalesce(col("tc"), lit(0L)) + 1L)
      .withColumn("rc1", col("rc") + 1L)
    (rawTok, model)
  }

  /** Token-budget-constrained selection: take documents in descending
    * `scoreCol` order (ties broken by ascending id — fully deterministic)
    * until the running token total exceeds `budget`. The "rank by quality,
    * cut at the compute budget" step every pretraining data plan ends
    * with, e.g. downstream of [[importanceWeights]] or a quality score.
    *
    * The cumulative total is [[Packing.prefixSum]]'s two-phase
    * distributed scan over a composite (-score, id) range key — NO
    * unpartitioned window anywhere, so the ranking survives a
    * corpus-sized input. Because the running total is monotone in the
    * selection order, `cum_tok <= budget` is a contiguous prefix: the
    * greedy cut needs no sequential pass.
    *
    * Returns every input row flagged: (idCol, score, n_tok, cum_tok,
    * selected), ordered by id. cum_tok is the INCLUSIVE running total in
    * selection order. */
  def selectByBudget(df: DataFrame, idCol: String, scoreCol: Column,
                     tokCol: Column, budget: Long): DataFrame = {
    val keyed = df.select(
      struct((-scoreCol).cast("long").as("s"), col(idCol).as("i")).as("_k"),
      tokCol.cast("long").as("_n"))
    Packing.prefixSum(keyed, "_k", col("_n"))
      .select(col("doc_id.i").as(idCol),
        (-col("doc_id.s")).as("score"),
        col("n").as("n_tok"),
        (col("start") + col("n")).as("cum_tok"),
        (col("start") + col("n") <= budget).as("selected"))
      .orderBy(idCol)
  }
}

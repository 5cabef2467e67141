package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language identification,
  * quality scoring, token counting. Pure `Column` expressions (whole-stage
  * codegen, no UDFs) so they stay cheap at 100 TB: a single projection,
  * no shuffle at all.
  */
object TextAnalysis {

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. With the
    * synthetic corpus all text is English-like; real lexicons would be larger.
    * Deterministic argmax with alphabetical tie-break. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Predicted language: lexicon with the highest distinct-token overlap;
    * ties resolved to the alphabetically-first language; no overlap -> "und"
    * (undetermined). */
  def langId(textCol: Column): Column = {
    val toks = array_distinct(split(textCol, " "))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, array(markers.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first (alphabetical) language achieving the max score
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(trim(textCol), "\\s+"))

  /** BPE-ish subword count: split on word boundaries/punct and count chunks
    * of <=4 chars (a cheap deterministic proxy for BPE token counts). */
  def subwordCount(textCol: Column): Column =
    aggregate(
      split(trim(textCol), "\\s+"),
      lit(0),
      (acc, w) => acc + ceil(length(w) / 4.0).cast("int"))

  /** Repetition metrics (the Gopher-rule family used to drop degenerate /
    * machine-generated text): fraction of the corpus' word-bigram mass held
    * by the single most frequent bigram, and the distinct-token ratio.
    * One explode + two hash aggregations with map-side partial combine —
    * the shuffle carries one row per (doc, distinct bigram), not per token.
    * All ratios floor-truncated to 4 decimals for cross-engine parity. */
  def repetitionScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def trunc4(c: Column): Column = floor(c * 10000) / 10000.0
    val toks = split(col(textCol), " ")
    val base = df.select(col(idCol), toks.as("w"))
    // adjacent bigrams via posexplode + get() — pure codegen (r15; was an
    // interpreted transform(sequence(...)) materializing a bigram array
    // per row; identical strings — concat_ws over two non-null tokens ==
    // concat_ws after the null filter, and single-token docs emit no rows
    // exactly as the old otherwise(array()) arm did)
    val counts = base
      .select(col(idCol), col("w"), posexplode(col("w")).as(Seq("p0", "t")))
      .withColumn("t1", get(col("w"), col("p0") + 1))
      .filter(col("t1").isNotNull)
      .select(col(idCol), concat_ws(" ", col("t"), col("t1")).as("b"))
      .groupBy(col(idCol), col("b")).count()
    val agg = counts.groupBy(col(idCol))
      .agg(max(col("count")).as("mx"), sum(col("count")).as("tot"))
    base.join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tot"), lit(0L)).cast("int").as("n_bigrams"),
        when(col("tot") > 0, trunc4(col("mx").cast("double") / col("tot")))
          .otherwise(lit(0.0)).as("top_bigram_frac"),
        trunc4(size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("distinct_ratio"))
  }

  /** Quality features as a struct: token count, stopword ratio, mean word
    * length, punctuation ratio (all floor-truncated to 4 decimals so SQL
    * mirrors match bit-for-bit).
    *
    * `extra` (r15): passthrough columns appended AFTER the feature columns
    * — lets a pipeline compute language-ID + quality features + payload in
    * ONE projection of one scan instead of self-joining two projections of
    * the same table on the id (the pre-r15 q_training_manifest /
    * q_curation_pipeline shape). Defaults to none, so every existing
    * caller's schema is byte-identical. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String,
                      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in"),
                      extra: Seq[Column] = Nil): DataFrame = {
    val toks = split(col(textCol), " ")
    def trunc4(c: Column): Column = floor(c * 10000) / 10000.0
    df.withColumn("n_tok", size(toks))
      .withColumn("n_stop", size(filter(toks, t => t.isin(stopwords.map(lit): _*))))
      .withColumn("n_punct", length(col(textCol)) -
        length(regexp_replace(col(textCol), "[\\.,;:!\\?]", "")))
      .select(Seq(col(idCol), col("n_tok"), col("n_stop"), col("n_punct"),
        trunc4(col("n_stop").cast("double") / col("n_tok")).as("stop_ratio"),
        trunc4((length(col(textCol)) - (col("n_tok") - 1)).cast("double") / col("n_tok"))
          .as("avg_wlen"),
        trunc4(col("n_punct").cast("double") / length(col(textCol))).as("punct_ratio"))
        ++ extra: _*)
  }

  /** Bigram conditional surprisal (the bigram upgrade of
    * [[unigramSurprisal]]): per adjacent token pair, the exact integer
    * rarity `1e6 * c(w1·) div c(w1 w2)` — the scaled inverse of the
    * conditional probability p(w2 | w1), monotone in -log p exactly as the
    * unigram rarity is. Low mean = formulaic continuations (boilerplate,
    * templated spam); high mean = incoherent token transitions (gibberish,
    * OCR noise) — the signal a count-based LM perplexity filter thresholds
    * on, kept log-free so any engine reproduces it bit-for-bit.
    *
    * Docs with fewer than two tokens have no bigrams and drop out (the
    * caller's length filter has already rejected them).
    *
    * Scale shape: bigrams come from one `zip_with` + explode (no
    * positional self-join); both count tables are distinct-gram-sized with
    * map-side partial aggregation; the rollup is one hash agg by doc. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // adjacent bigrams via posexplode + get() — pure codegen (r15; was an
    // interpreted zip_with over slices; identical strings, see
    // [[collocations]])
    val big = df.select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), col("_w"), posexplode(col("_w")).as(Seq("p0", "t")))
      .withColumn("t1", get(col("_w"), col("p0") + 1))
      .filter(col("t1").isNotNull)
      .select(col(idCol), concat(col("t"), lit(" "), col("t1")).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val cb = big.groupBy("bg").agg(count(lit(1)).as("cb"))
    val cl = big.groupBy("w1").agg(count(lit(1)).as("cl"))
    big.join(cb, Seq("bg")).join(cl, Seq("w1"))
      .withColumn("rarity", expr("(1000000 * cl) div cb"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_big"), sum("rarity").as("sum_rarity"))
      .withColumn("mean_rarity", expr("sum_rarity div n_big"))
      .select(col(idCol), col("n_big"), col("sum_rarity"), col("mean_rarity"))
  }

  /** Per-group quality bucketing: ntile(`nBuckets`) of an exact-integer
    * quality key within each group — the "keep the top 30% of each source"
    * primitive (per-source percentiles, so a uniformly-verbose source
    * cannot crowd out a terse one the way one global cut would). The key is
    * stopword permille (10000 * n_stop div n_tok, higher = more natural
    * prose), an integer so the ordering — and therefore every bucket
    * boundary — is bit-identical across engines; ties break on the id.
    *
    * Scale shape: one window partitioned by the group column — a single
    * hash exchange with per-group sorts; groups are sources/domains, whose
    * sizes the upstream [[graft.operators.Sampling.capPerGroup]] bounds. */
  def qualityBuckets(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, nBuckets: Int = 10): DataFrame = {
    val toks = split(col(textCol), " ")
    val stop = Seq("the", "a", "and", "of", "to", "in")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col("q_key").desc, col(idCol))
    df.select(col(idCol), col(groupCol),
        (size(filter(toks, t => t.isin(stop.map(lit): _*))).cast("long") * 10000L)
          .as("_s"),
        size(toks).cast("long").as("_n"))
      .withColumn("q_key", expr("_s div _n"))
      .withColumn("q_bucket", ntile(nBuckets).over(w).cast("long"))
      .select(col(idCol), col(groupCol), col("q_key"), col("q_bucket"))
  }

  /** Corpus vocabulary building (the tokenizer-prep step): global
    * occurrence counts of whitespace tokens, truncated to the `k` most
    * frequent (ties broken by token text so the cut is deterministic).
    * One explode + one hash-partitioned count with map-side partial
    * aggregation; the final top-k is a TakeOrdered over the aggregated
    * (distinct-token-sized, not corpus-sized) counts. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Vocabulary as an id table: the top-`k` tokens of [[topTokens]] with a
    * dense 1-based id in (count desc, token) order — id 0 is reserved for
    * out-of-vocabulary. The ranking window runs over the aggregated
    * distinct-token table (vocab-sized), not the corpus. */
  def vocabIds(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    topTokens(df, textCol, k)
      .withColumn("token_id", row_number().over(w))
      .select(col("token"), col("token_id"), col("n"))
  }

  /** Tokenizer application (the encode step after vocabulary building):
    * map every token of every document to its vocabulary id, 0 for
    * out-of-vocabulary. Returns one (id, pos, token_id) row per token —
    * the flat layout a sequence-packing stage consumes.
    *
    * Scale: the vocabulary is bounded (top-k) so Spark broadcasts it; the
    * corpus side is explode + broadcast-hash-join + projection — no
    * shuffle of corpus data at all. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
    toks.join(broadcast(vocab.select("token", "token_id")), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))
  }

  /** Tokenizer-coverage audit: per-group token totals, out-of-vocabulary
    * counts and the OOV rate in integer basis points under a FIXED
    * vocabulary — the "does this tokenizer fit that source" report read
    * before committing a vocab corpus-wide (a source whose oov_bp spikes
    * is about to be shredded into byte-fallback garbage). Empty tokens
    * are excluded, matching [[topTokens]]'s counting. Integer floor-div
    * rate so the report is bit-identical across engines.
    *
    * Scale: one explode + broadcast vocab join + one partial-agg shuffle
    * on the group key — corpus rows never shuffle. */
  def oovRate(df: DataFrame, groupCol: String, textCol: String,
              vocab: DataFrame): DataFrame = {
    val toks = df.select(col(groupCol),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    toks.join(broadcast(vocab.select("token", "token_id")), Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", expr("n_oov * 10000 div n_tok"))
  }

  /** Per-document keyword extraction: the `k` most frequent non-stopword
    * tokens of each document, ranked by count descending with the token
    * text as a deterministic tie-break. One explode + hash aggregation
    * (map-side partial combine), then a window partitioned BY DOCUMENT —
    * no global ordering, so the plan scales with the corpus. Returns
    * (id, rank, token, n). */
  def topKeywords(df: DataFrame, idCol: String, textCol: String, k: Int,
                  stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "" && !col("token").isin(stopwords: _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("n").desc, col("token"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("n"))
  }

  /** Length-percentile trimming (drop the shortest/longest tails, the
    * standard "too short to be text / too long to be one document" filter):
    * keeps rows whose token count lies within the [pLo, pHi] DISCRETE
    * percentiles, where the p-th percentile is the smallest length whose
    * cumulative count reaches ceil(p * n). Percentiles are given as exact
    * rationals (numerator/denominator) so the thresholds are pure integer
    * arithmetic — no float multiply whose rounding could move a boundary.
    *
    * Scale: the corpus is never globally sorted. The cumulative window runs
    * over the DISTINCT-LENGTH histogram (cardinality = number of distinct
    * token counts, bounded and tiny relative to the corpus), and the two
    * 1-row thresholds broadcast back onto a pure filter. */
  def lengthPercentileTrim(df: DataFrame, idCol: String, textCol: String,
                           loNum: Int = 5, hiNum: Int = 95,
                           den: Int = 100): DataFrame = {
    val nTok = size(split(col(textCol), " "))
    val lens = df.select(col(idCol), nTok.as("n_tok"))
    val hist = lens.groupBy("n_tok").agg(count(lit(1)).as("cnt"))
    val wc = org.apache.spark.sql.expressions.Window.orderBy("n_tok")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum("cnt").over(wc))
      .crossJoin(broadcast(lens.agg(count(lit(1)).as("n"))))
    def kth(num: Int): Column = expr(s"($num * n + ${den - 1}) div $den")
    val lo = cum.filter(col("cum") >= kth(loNum))
      .agg(min("n_tok").as("lo_tok"))
    val hi = cum.filter(col("cum") >= kth(hiNum))
      .agg(min("n_tok").as("hi_tok"))
    lens.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .filter(col("n_tok") >= col("lo_tok") && col("n_tok") <= col("hi_tok"))
      .select(col(idCol), col("n_tok"), col("lo_tok"), col("hi_tok"))
  }

  /** Canonical text normalization applied before hashing/dedup (the
    * C4-style step that keeps trivially-reformatted copies from escaping
    * exact dedup): lowercase, collapse all whitespace runs to one space,
    * trim. Pure codegen projection; deliberately ASCII-safe operations so
    * any SQL engine normalizes identically. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Unigram-frequency surprisal proxy — the CCNet-style "how unusual is
    * this document's vocabulary" quality signal, log-free: every token t
    * gets the integer rarity floor(1e6 * S / c(t)) (S = corpus token
    * count, c(t) = t's corpus count — i.e. the scaled inverse unigram
    * probability, monotone in true surprisal -log p(t)), and a document
    * scores the floor mean rarity of its tokens. Low = stitched from the
    * corpus's most common tokens (boilerplate); high = rare-vocabulary
    * text (often noise/gibberish); both tails are the standard drop
    * candidates. Exact integer arithmetic throughout (the repo-wide parity
    * rule — no ln, no float accumulation).
    *
    * Scale shape: one explode + one token-keyed count (map-side partial
    * agg, vocab-sized result), one shuffle join of the token stream
    * against that count, one per-doc aggregation. No windows, no
    * collect. Returns (id, n_tok, sum_rarity, mean_rarity). */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("t"))
    val counts = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val stats = tok.agg(count(lit(1)).as("S"))
    val rar = tok.join(counts, Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("_num", lit(1000000L) * col("S"))
      .withColumn("rarity", expr("_num div c"))
    rar.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum("rarity").as("sum_rarity"))
      .withColumn("mean_rarity", expr("sum_rarity div n_tok"))
      .select(col(idCol), col("n_tok"), col("sum_rarity"), col("mean_rarity"))
  }

  /** BM25 relevance ranking of the corpus against a small query-term set —
    * the retrieval primitive behind targeted data selection and
    * decontamination triage ("which training docs look like this eval
    * prompt"). Returns the `topK` docs as (rank, id, score, dl).
    *
    * Two scoring modes:
    *  - parity (default): a fully RATIONAL BM25 with k1 = 6/5, b = 3/4 and
    *    a log-free idf surrogate (N - df + 1)/(df + 1). Folding the
    *    rationals gives the exact integer per-term score
    *      floor(1e6 * (N-df+1) * 22*S*tf
    *            / ((df+1) * (10*S*tf + 3*S + 9*dl*N)))
    *    (S = corpus token count, dl = doc length): every intermediate is a
    *    64-bit integer, so any SQL engine reproduces it bit-for-bit — no
    *    ln() whose last-ulp rounding could move a floor boundary, no
    *    float-summation-order sensitivity. The surrogate is monotone in df
    *    exactly as ln is, so single-term orderings match true BM25.
    *    Headroom: the numerator stays under 2^63 for corpora up to ~4e11
    *    total tokens at 1e6 scaling; beyond that, use the prod mode.
    *  - prod (`logIdf = true`): textbook double-precision BM25 with
    *    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the production scorer,
    *    benchmarked rows-only (no cross-engine oracle, like the xxhash64
    *    twins).
    *
    * Scale shape: the term filter collapses the explode to query-term rows
    * only (corpus-sized scan, query-sized shuffle); df and the 1-row corpus
    * stats broadcast; the top-K is TakeOrdered (no global sort
    * materialization), and the rank window runs over topK rows. */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], topK: Int = 20,
               logIdf: Boolean = false): DataFrame = {
    val toks = split(col(textCol), " ")
    val docs = df.select(col(idCol), size(toks).as("dl"), toks.as("w"))
    val stats = docs.agg(count(lit(1)).as("N"),
      sum(col("dl").cast("long")).as("S"))
    val tf = docs.select(col(idCol), col("dl"), explode(col("w")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("t")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("t").agg(countDistinct(col(idCol)).as("df"))
    val joined = tf.join(broadcast(dfT), Seq("t")).crossJoin(broadcast(stats))
    val scored =
      if (logIdf)
        joined.withColumn("score_t",
          log(lit(1.0) + (col("N") - col("df") + 0.5) / (col("df") + 0.5)) *
            (lit(22.0) * col("S") * col("tf")) /
            (lit(10.0) * col("S") * col("tf") + lit(3.0) * col("S") +
              lit(9.0) * col("dl").cast("double") * col("N")))
      else
        joined
          .withColumn("num",
            lit(1000000L) * (col("N") - col("df") + 1) * lit(22L) *
              col("S") * col("tf"))
          .withColumn("den",
            (col("df") + 1) * (lit(10L) * col("S") * col("tf") +
              lit(3L) * col("S") + lit(9L) * col("dl").cast("long") * col("N")))
          .withColumn("score_t", expr("num div den"))
    val perDoc = scored.groupBy(col(idCol), col("dl"))
      .agg(sum("score_t").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col(idCol))
    perDoc.withColumn("rank", row_number().over(w))
      .select(col("rank"), col(idCol), col("score"), col("dl"))
  }

  /** PII patterns — deliberately restricted to the regex subset where Java
    * regex (Spark) and RE2 (DuckDB, common cross-engine baseline) agree: no
    * backreferences, no lookaround, \b word boundaries only. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+\\d{1,3}-\\d{3}-\\d{2,10}\\b"
  val ssnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** PII detection + redaction for training-data curation: counts and
    * masks emails, international-format phone numbers, and SSNs. Pure
    * projection (zero shuffle, codegen'd regexp) — the standard pre-training
    * scrub pass. Counts are taken BEFORE redaction; replacement order is
    * email -> phone -> ssn (the patterns cannot overlap each other's
    * replacements). Returns (id, n_emails, n_phones, n_ssns, redacted). */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, emailPattern, "[EMAIL]"),
        phonePattern, "[PHONE]"),
      ssnPattern, "[SSN]")
    df.select(col(idCol),
      regexp_count(t, lit(emailPattern)).cast("long").as("n_emails"),
      regexp_count(t, lit(phonePattern)).cast("long").as("n_phones"),
      regexp_count(t, lit(ssnPattern)).cast("long").as("n_ssns"),
      redacted.as("redacted"))
  }

  /** Compression-ratio quality signal: per-document DEFLATE size over raw
    * size (basis points). Highly repetitive or templated text compresses
    * far below natural prose, and high-entropy gibberish barely compresses
    * at all — the cheap, language-agnostic filter band (keep documents in
    * a middle ratio band) used alongside the Gopher repetition rules.
    *
    * This is per-row JVM codec work with no Catalyst equivalent (the
    * Multimodal precedent), so it runs as a deterministic Scala UDF —
    * fixed level, default strategy — inside a zero-shuffle projection.
    * No SQL engine mirrors deflate, so the query is a rows-only surface;
    * the behavioral contract is spec-tested (repetitive < prose < random
    * ordering, determinism, empty/null safety). */
  private def deflatedLenUdf(level: Int) = udf { (s: String) =>
    if (s == null || s.isEmpty) 0L
    else {
      val d = new java.util.zip.Deflater(level, false)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
  }

  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    val deflatedLen = deflatedLenUdf(level)
    df.select(col(idCol),
      octet_length(col(textCol)).cast("long").as("raw_bytes"),
      deflatedLen(col(textCol)).as("deflate_bytes"))
      .withColumn("ratio_bp",
        when(col("raw_bytes") > 0,
          expr("(deflate_bytes * 10000) div raw_bytes")).otherwise(lit(0L)))
  }

  /** [[compressionRatio]] plus the self-concatenation deflate size — the
    * raw signals the q_compress_ratio consistency gate checks against
    * deflate's statable invariants (zlib's compressBound ceiling; the
    * back-reference bound on deflate(t‖t) for sub-window texts). Two
    * deflate passes per doc, still a zero-shuffle projection. */
  def compressionSignals(df: DataFrame, idCol: String, textCol: String,
                         level: Int = 6): DataFrame = {
    val deflatedLen = deflatedLenUdf(level)
    df.select(col(idCol),
      octet_length(col(textCol)).cast("long").as("raw_bytes"),
      deflatedLen(col(textCol)).as("deflate_bytes"),
      // concat of a NULL text is NULL -> udf maps to 0, same as the base
      deflatedLen(concat(col(textCol), col(textCol))).as("dbl_bytes"))
      .withColumn("ratio_bp",
        when(col("raw_bytes") > 0,
          expr("(deflate_bytes * 10000) div raw_bytes")).otherwise(lit(0L)))
  }

  /** PMI collocation mining: the corpus's top-k adjacent word pairs by
    * pointwise mutual information — phrase discovery for tokenizer vocab
    * seeding and multi-word-expression detection. PMI = log p(ab) /
    * (p(a)·p(b)) is ranked WITHOUT logs or doubles: the monotone surrogate
    * n_ab·N² / (n_a·n_b·B) is scored as exact floor-scaled basis points,
    * so the ranking — and every tie — is bit-identical across engines
    * (ties break on the word pair). An in-plan assert_true guard fails
    * loudly when n_ab·N²·10⁴ approaches 2⁶³ (the DSIR parity-headroom
    * discipline) instead of wrapping silently.
    *
    * Scale shape: bigram and unigram count tables are partial-agg
    * shuffles over exploded tokens; the unigram table is |vocab| rows
    * (broadcast at typical vocab sizes — swap to plain equi-joins beyond
    * ~10⁷ types); totals are broadcast 1-row aggregates; final top-k is
    * TakeOrdered, never a global window sort. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
                   topK: Int = 100): DataFrame = {
    val toks = split(col(textCol), " ")
    // adjacent pairs via posexplode + get() against the row's own token
    // array — pure codegen (r15; the zip_with-over-slices form evaluated
    // an interpreted lambda per element). Identical pairs: the second
    // token is _w[p0+1], null past the end, filtered exactly where the
    // shorter zipped slice ended the old list.
    val big = df.select(split(col(textCol), " ").as("_w"))
      .select(col("_w"), posexplode(col("_w")).as(Seq("p0", "w1")))
      .select(col("w1"), get(col("_w"), col("p0") + 1).as("w2"))
      .filter(col("w2").isNotNull)
    val uni = df.select(explode(toks).as("t"))
    val cu = uni.groupBy("t").agg(count(lit(1)).as("c"))
    val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val joined = cb
      .join(broadcast(cu.select(col("t").as("w1"), col("c").as("n_a"))), Seq("w1"))
      .join(broadcast(cu.select(col("t").as("w2"), col("c").as("n_b"))), Seq("w2"))
      .crossJoin(broadcast(uni.agg(count(lit(1)).as("N"))))
      .crossJoin(broadcast(big.agg(count(lit(1)).as("B"))))
    val guard = assert_true(
      col("n_ab").cast("double") * col("N").cast("double") *
        col("N").cast("double") < 9.2e14,
      lit("collocation parity headroom exceeded: n_ab * N^2 * 10^4 must " +
        "stay under 2^63 — pre-aggregate per shard or scale counts down"))
    joined
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        (expr("(n_ab * N * N * 10000) div (n_a * n_b * B)") +
          coalesce(guard.cast("long"), lit(0L))).as("pmi_bp"))
      .orderBy(col("pmi_bp").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Trigram stupid-backoff surprisal scored against a REFERENCE slice —
    * the CCNet filtering discipline (Wenzek et al. 2020: an n-gram LM
    * counted on a trusted corpus scores every crawled document; both
    * tails are drop candidates — too formulaic and too alien). The model
    * is counted on `ref` (e.g. one curated source) and every `df`
    * document is scored against it, unlike [[bigramSurprisal]] whose
    * counts are self-referential. Per scored position (3rd token onward)
    * the exact integer rarity is the scaled inverse stupid-backoff score
    * (Brants et al. 2007 "Large Language Models in Machine Translation",
    * alpha = 2/5), highest matched order wins:
    *   trigram seen:   1e6 * c(w1 w2 ·) div c(w1 w2 w3)
    *   else bigram:    (1e6 * c(w2 ·) div c(w2 w3)) * 5 div 2
    *   else unigram:   (1e6 * T div c(w3)) * 25 div 4
    *   else OOV:       (1e6 * (T + 1)) * 25 div 4     (above any in-vocab)
    * (context counts count GRAMS, matching [[bigramSurprisal]]; T = ref
    * token count). Log-free, so every rarity and every backoff-level
    * decision is bit-identical on any engine — no ln whose last-ulp
    * rounding could flip a floor, no float summation order.
    *
    * Scale shape: the model is PRECOMPUTED into one per-level (key,
    * rarity) table each (rarities folded at build time with model-sized
    * joins), keyed by 60-bit md5 hashes so the scoring joins carry 8-byte
    * keys; scoring keeps ONE row per trigram position carrying its three
    * lookup keys and left-joins the three level tables — when the curated
    * reference is broadcast-sized (its defining property) AQE turns all
    * three into broadcast-hash joins, then one map-side-combined per-doc
    * rollup. Against a reference too large to broadcast the three shuffle
    * joins re-exchange the corpus thrice — prefer sharding the scoring by
    * reference partition at that point.
    *
    * Gram construction is posexplode + two `lead`s over a
    * (doc, position) window — ONE token-stream exchange keyed by doc id
    * (per-doc sorts, bounded by document length), after which every
    * gram concat and hash runs inside codegen. The tempting zero-shuffle
    * alternative — `transform(sequence(...))` building per-position key
    * structs — evaluates INTERPRETED (Spark higher-order functions are
    * CodegenFallback) at ~60 us per position and loses by an order of
    * magnitude at every scale (measured at sf0.1: 4.5 s for the
    * interpreted explode alone vs 0.4 s for the windowed chain; the full
    * query 7.8 s -> 2.6 s). The window also lets the model build derive
    * uni/bi/tri counts from a SINGLE reference scan.
    * A 60-bit hash collision merges two grams identically in the oracle
    * (same md5). In-plan assert_true guard fails loudly when
    * n_scored * T approaches 2^63 / (6.25e6) instead of wrapping.
    *
    * Returns (id, n_scored, n_tri, n_bi, n_uni, n_oov, sum_rarity,
    * mean_rarity); docs with fewer than 3 tokens have no trigram position
    * and drop out. */
  /** Per-group token-distribution drift against the whole corpus — the
    * total-variation distance used to monitor crawl snapshots and pick
    * data-mixing weights (a source whose unigram distribution has drifted
    * far from the corpus mean is a re-weighting / re-crawl candidate).
    * For group s with token counts c_s[t] (total N_s) and corpus counts
    * c[t] (total N):
    *
    *   TV(s) = 1/2 * sum_t | c_s[t]/N_s - c[t]/N |
    *         = ( sum_{t in s} |c_s[t]*N - c[t]*N_s|
    *             + N_s * (N - sum_{t in s} c[t]) ) / (2 * N * N_s)
    *
    * — the closed-form second term folds every token ABSENT from the
    * group, so no full-vocabulary outer join is needed. All arithmetic is
    * exact decimal(38,0): longs are widened to decimal(19,0) so each
    * product is exact, and `tv_bp = (5000 * num) div (N * N_s)` is an
    * integral division any engine reproduces bit-for-bit (DuckDB mirrors
    * it in HUGEINT). Headroom: num <= 2*N*N_s, so the widest value is
    * 1e4 * N * N_s — at N = 1e15 corpus tokens and N_s = 1e14 that is
    * 1e33 < 1e38; an in-plan assert_true fails loudly past N ~ 3e16
    * rather than silently truncating.
    *
    * Tokens are keyed by the shared 60-bit md5 hash ([[TextDedup.stableHash]])
    * so the vocabulary join carries 8-byte keys; a collision merges two
    * tokens identically in the oracle (same md5). Also reports per-group
    * vocabulary shape: n_types (distinct tokens) and the hapax ratio
    * (share of types seen exactly once — Zipf-tail health).
    *
    * Scale shape: one corpus-scan explode into a (group, token)-keyed
    * partial aggregation (map-side combine collapses repeats before the
    * exchange); corpus counts derive from THAT table by a second
    * vocabulary-sized aggregation — the corpus is never exploded twice;
    * the group totals are an O(#groups) broadcast; the final rollup is
    * one hash aggregation keyed by group. No window, nothing quadratic.
    *
    * Returns (groupCol, n_tokens, n_types, hapax, hapax_bp, tv_bp)
    * ordered by group. */
  def distributionDrift(df: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(19,0)")
    val gcnt = df
      .select(col(groupCol), explode(split(col(textCol), " ")).as("t"))
      .select(col(groupCol), TextDedup.stableHash(col("t")).as("k"))
      .groupBy(col(groupCol), col("k")).agg(count(lit(1)).as("cs"))
    val ccnt = gcnt.groupBy("k").agg(sum("cs").as("c"))
    val gtot = gcnt.groupBy(col(groupCol))
      .agg(sum("cs").as("ns"), count(lit(1)).as("n_types"),
        sum(when(col("cs") === 1, 1L).otherwise(0L)).as("hapax"))
    val nTot = gtot.agg(sum("ns").as("n"),
      // loud guard instead of silent decimal overflow past ~3e16 tokens
      assert_true(sum("ns") < 3.0e16,
        lit("distributionDrift decimal headroom: corpus token count must " +
          "stay under ~3e16 for exact 38-digit TV arithmetic — shard the " +
          "corpus or rescale the bp base")).as("_g"))
    val perGroup = gcnt.join(ccnt, Seq("k"))
      .join(broadcast(gtot.select(col(groupCol), col("ns"))), Seq(groupCol))
      .crossJoin(broadcast(nTot))
      .groupBy(col(groupCol))
      .agg(sum(abs(dec(col("cs")) * dec(col("n")) -
             dec(col("c")) * dec(col("ns")))).as("num1"),
        sum(dec(col("c"))).as("cmass"),
        max(dec(col("n"))).as("n"), max(col("_g")).as("_g"))
    perGroup
      .join(broadcast(gtot), Seq(groupCol))
      .select(col(groupCol),
        col("ns").as("n_tokens"), col("n_types"), col("hapax"),
        expr("(10000 * hapax) div n_types").as("hapax_bp"),
        (expr("((num1 + CAST(ns AS DECIMAL(19,0)) * (n - cmass)) * 5000) " +
           "div (n * CAST(ns AS DECIMAL(19,0)))") +
          coalesce(col("_g").cast("long"), lit(0L))).as("tv_bp"))
      .orderBy(groupCol)
  }

  def backoffSurprisal(df: DataFrame, ref: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val h: Column => Column = TextDedup.stableHash
    // (doc, pos, t, t1, t2): following tokens via get() against the token
    // array the row already holds — pure codegen, ZERO exchange (r15; the
    // old lead-over-(doc,pos)-window form paid a doc-keyed token exchange
    // + per-doc sort on BOTH the reference and the corpus scan for values
    // the array lookup produces identically: lead(t, i) == _w[pos + i],
    // null past the end)
    def positions(d: DataFrame): DataFrame = d
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), col("_w"), posexplode(col("_w")).as(Seq("pos", "t")))
      .select(col(idCol), col("pos"), col("t"),
        get(col("_w"), col("pos") + 1).as("t1"),
        get(col("_w"), col("pos") + 2).as("t2"))

    // --- model: gram-count tables from ONE reference scan ---
    val rp = positions(ref)
    val cu = rp.groupBy(h(col("t")).as("ku")).agg(count(lit(1)).as("cu"))
    // derived from the aggregated table, not a second reference scan
    val tTot = cu.agg(sum("cu").as("T"))
    // per-level rarity folded at model-build time; context counts derive
    // from the per-gram tables (model-sized second aggregations)
    val t3 = rp.filter(col("t2").isNotNull)
      .groupBy(h(concat_ws(" ", col("t"), col("t1"), col("t2"))).as("k3"),
        h(concat_ws(" ", col("t"), col("t1"))).as("kc"))
      .agg(count(lit(1)).as("ct"))
    val m3 = t3
      .join(t3.groupBy("kc").agg(sum("ct").as("cc")), Seq("kc"))
      .select(col("k3"), expr("(1000000 * cc) div ct").as("r3"))
    val t2g = rp.filter(col("t1").isNotNull)
      .groupBy(h(concat_ws(" ", col("t"), col("t1"))).as("kb"),
        h(col("t")).as("kl"))
      .agg(count(lit(1)).as("cb"))
    val m2 = t2g
      .join(t2g.groupBy("kl").agg(sum("cb").as("cl")), Seq("kl"))
      .select(col("kb"), expr("((1000000 * cl) div cb) * 5 div 2").as("r2"))
    val m1 = cu.crossJoin(broadcast(tTot))
      .select(col("ku"), expr("((1000000 * T) div cu) * 25 div 4").as("r1"))

    // --- scoring: one row per position, three left lookups ---
    val perPos = positions(df).filter(col("t2").isNotNull)
      .select(col(idCol),
        h(concat_ws(" ", col("t"), col("t1"), col("t2"))).as("k3"),
        h(concat_ws(" ", col("t1"), col("t2"))).as("kb"),
        h(col("t2")).as("ku"))
      .join(m3, Seq("k3"), "left")
      .join(m2, Seq("kb"), "left")
      .join(m1, Seq("ku"), "left")
      .crossJoin(broadcast(tTot))
      .select(col(idCol),
        when(col("r3").isNotNull, 3).when(col("r2").isNotNull, 2)
          .when(col("r1").isNotNull, 1).otherwise(0).as("level"),
        coalesce(col("r3"), col("r2"), col("r1"),
          expr("(1000000 * (T + 1)) * 25 div 4")).as("rarity"),
        col("T"))
    val guard = assert_true(
      col("n_scored").cast("double") * col("_T").cast("double") < 1.4e12,
      lit("backoff parity headroom exceeded: scored positions per doc x " +
        "reference tokens must stay under ~1.4e12 (sum of 1e6-scale " +
        "rarities vs 2^63) — scale the rarity base down for refs this large"))
    perPos.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("level") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("level") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("level") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(when(col("level") === 0, 1L).otherwise(0L)).as("n_oov"),
        sum("rarity").as("_sum"), max("T").as("_T"))
      .select(col(idCol), col("n_scored"), col("n_tri"), col("n_bi"),
        col("n_uni"), col("n_oov"),
        (col("_sum") + coalesce(guard.cast("long"), lit(0L))).as("sum_rarity"),
        expr("_sum div n_scored").as("mean_rarity"))
  }
}

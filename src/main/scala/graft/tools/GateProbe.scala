package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{TextAnalysis, TextDedup}

/** Measurement probe for the r13 no_oracle consistency gates (VERDICT r12
  * #4): before gating q_bm25_prod on rank agreement and q_winnow_fp_prod on
  * per-doc fingerprint-count bands, measure what the production/parity
  * twins actually agree on at sf0.01 (the correctness gate's scale) and
  * sf0.1 — bounds must come from data, not guesses. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val docs = Tables.documents(spark, dir)

      // ---- bm25: parity vs prod top-20 ----
      val terms = Seq("spark", "window", "customer", "vector")
      val par = TextAnalysis.bm25Rank(docs, "doc_id", "text", terms, topK = 20)
        .select(col("rank").as("r_par"), col("doc_id"))
      val prod = TextAnalysis.bm25Rank(docs, "doc_id", "text", terms,
          topK = 25, logIdf = true)
        .select(col("rank").as("r_prod"), col("doc_id"))
      val j = par.join(prod, Seq("doc_id"), "left")
      val n20 = j.filter(col("r_prod") <= 20).count()
      val n25 = j.filter(col("r_prod").isNotNull).count()
      val exact = j.filter(col("r_prod") === col("r_par")).count()
      println(s"GATE bm25 $dir: parity20 in prod20=$n20, in prod25=$n25, " +
        s"exact-rank matches=$exact of 20")

      // ---- winnow: per-doc fp-count ratio prod/parity ----
      def counts(parity: Boolean) =
        TextDedup.winnowingFingerprints(docs, "doc_id", "text",
            oracleParity = parity)
          .groupBy("doc_id").agg(count(lit(1)).as(if (parity) "np" else "nq"))
      val wj = counts(parity = true).join(counts(parity = false), Seq("doc_id"),
          "full")
        .select(coalesce(col("np"), lit(0L)).as("np"),
          coalesce(col("nq"), lit(0L)).as("nq"))
      val stats = wj.agg(count(lit(1)).as("n"),
        sum(when(col("np") === 0 || col("nq") === 0, 1L).otherwise(0L)).as("zeros"),
        min(col("nq").cast("double") / col("np")).as("rmin"),
        max(col("nq").cast("double") / col("np")).as("rmax"),
        expr("percentile_approx(nq / np, array(0.01, 0.5, 0.99), 10000)").as("q"))
        .head()
      println(s"GATE winnow $dir: docs=${stats.getLong(0)} zeros=${stats.getLong(1)} " +
        s"ratio min=${stats.getDouble(2)} max=${stats.getDouble(3)} " +
        s"q01/q50/q99=${stats.getSeq[Double](4)}")

      // ---- minhash structural invariant: sig(t||' '||t) <= sig(t) ----
      val base = TextDedup.minHashSignature(docs, "doc_id", "text",
        oracleParity = false)
      val doubled = TextDedup.minHashSignature(
        docs.withColumn("text", concat(col("text"), lit(" "), col("text"))),
        "doc_id", "text", oracleParity = false)
      val cmp = base.join(doubled.select(col("doc_id") +:
          (0 until 8).map(i => col(s"mh$i").as(s"dh$i")): _*), Seq("doc_id"))
      val bad = cmp.filter((0 until 8).map(i =>
        col(s"dh$i") > col(s"mh$i")).reduce(_ || _)).count()
      println(s"GATE minhash $dir: monotonicity violations=$bad")

      // ---- deflate (q_compress_ratio gate, r14): measure the margins of
      // the three statable invariants before gating on them.
      //   ceiling: deflate_bytes <= zlib compressBound(raw)
      //            = raw + raw/2^12 + raw/2^14 + raw/2^25 + 13
      //   floor:   deflate_bytes >= 7 for non-empty input (2B zlib header
      //            + >=1B block + 4B adler)
      //   doubling (raw < 30000, inside the 32KB LZ77 window): the second
      //   copy of text||text is coverable by <=ceil(raw/258) max-length
      //   back-references, so dbl <= deflate + ceil(raw/258)*5 + slack —
      //   slack absorbs Huffman-table drift; MEASURE its real max.
      val sig = TextAnalysis.compressionSignals(docs, "doc_id", "text")
      val bound = col("raw_bytes") + shiftright(col("raw_bytes"), 12) +
        shiftright(col("raw_bytes"), 14) + shiftright(col("raw_bytes"), 25) +
        lit(13L)
      val refBudget = ceil(col("raw_bytes").cast("double") / 258.0)
        .cast("long") * 5L
      val dstats = sig.filter(col("raw_bytes") > 0).agg(
        count(lit(1)).as("n"),
        min(col("deflate_bytes")).as("dmin"),
        max(col("deflate_bytes") - bound).as("over_bound_max"),
        max(when(col("raw_bytes") < 30000,
          col("dbl_bytes") - col("deflate_bytes") - refBudget)).as("dbl_slack_max"),
        sum(when(col("raw_bytes") >= 30000, 1L).otherwise(0L)).as("n_big"),
        min(col("ratio_bp")).as("bp_min"), max(col("ratio_bp")).as("bp_max"))
        .head()
      println(s"GATE deflate $dir: docs=${dstats.getLong(0)} " +
        s"minDeflate=${dstats.getLong(1)} overBoundMax=${dstats.getLong(2)} " +
        s"dblSlackMax=${dstats.getLong(3)} nBig=${dstats.getLong(4)} " +
        s"bp=[${dstats.getLong(5)},${dstats.getLong(6)}]")
    }
    spark.stop()
  }
}

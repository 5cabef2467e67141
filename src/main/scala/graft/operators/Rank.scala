package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-list fusion for hybrid retrieval.
  *
  * Modern retrieval runs SEVERAL rankers over the same corpus — lexical
  * BM25, dense embedding cosine, recency, centrality — and fuses their
  * rankings instead of their incomparable scores. Reciprocal-rank fusion
  * (Cormack/Clarke/Buettcher 2009) is the standard: a document's fused
  * score is the sum over lists of 1/(k + rank), which rewards appearing
  * near the top of ANY list and needs no score calibration between
  * rankers. This is the glue between [[TextAnalysis.bm25Rank]] and the
  * [[Similarity]] ANN surface — the sparse+dense hybrid every RAG /
  * data-curation retrieval stack runs.
  *
  * The float 1/(k+r) is restated as the exact integer
  * `scale div (k + rank)` so the fused ranking (and every tie) is
  * bit-identical across engines — same discipline as BM25's integer
  * rational scoring. With the defaults the widest sum is
  * nLists * scale/(k+1), nowhere near 2^63.
  *
  * Scale shape: each input list is already small (a top-K per ranker, or
  * a per-query candidate set keyed by query id), so fusion is a unionAll
  * + one map-side-combining sum keyed by doc — no corpus scan, no window
  * wider than the fused candidate set. The final rank window runs AFTER
  * the per-doc aggregation over at most sum(|list|) rows.
  */
object Rank {

  /** Fuse ranked lists (each `(idCol, rankCol)` with rank starting at 1)
    * by reciprocal-rank fusion. Returns `(rank, idCol, rrf_score,
    * n_lists)` for the `topK` fused docs: rrf_score = sum over lists of
    * `scale div (k + rank_l)`, n_lists = how many lists carried the doc;
    * fused ties break to the smaller id. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int = 60, scale: Long = 1000000000L,
              topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    require(k >= 0, s"k must be >= 0, got $k")
    val contribs = lists.map { l =>
      l.select(col(idCol),
        expr(s"$scale div ($k + CAST($rankCol AS BIGINT))").as("_c"))
    }.reduce(_ unionByName _)
    val fused = contribs.groupBy(col(idCol))
      .agg(sum(col("_c")).as("rrf_score"),
        count(lit(1)).cast("int").as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
    // rank window AFTER limit(topK) — input is <= topK rows (the same
    // bounded-window pattern as bm25Rank's final ranking).
    val w = Window.orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .select(col("rank"), col(idCol), col("rrf_score"), col("n_lists"))
  }
}

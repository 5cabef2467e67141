package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Selection

/** Specs for DSIR-style importance weighting (Selection). */
class SelectionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus() = {
    import spark.implicits._
    // target vocabulary: {alpha beta}; off-target: {zulu yankee}
    Seq(
      (1L, "alpha beta alpha beta"),   // pure target-like
      (2L, "alpha zulu beta yankee"),  // mixed
      (3L, "zulu yankee zulu yankee")  // pure off-target
    ).toDF("doc_id", "text")
  }

  test("importance weights rank target-like docs above off-target docs") {
    spark.sparkContext.setLogLevel("ERROR")
    val raw = corpus()
    val target = raw.filter(col("doc_id") === 1L)
    val got = Selection.importanceWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("mean_score")).toMap
    assert(got(1L) > got(2L), s"pure target ${got(1L)} <= mixed ${got(2L)}")
    assert(got(2L) > got(3L), s"mixed ${got(2L)} <= off-target ${got(3L)}")
  }

  test("prod log-ratio mode agrees with parity mode on ranking") {
    spark.sparkContext.setLogLevel("ERROR")
    val raw = corpus()
    val target = raw.filter(col("doc_id") === 1L)
    val prod = Selection.importanceWeights(raw, target, "doc_id", "text",
        logRatio = true)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_score")).toMap
    // With +1-per-bucket smoothing over nBuckets >> corpus size, absolute
    // signs are smoothing-dominated at toy scale; the RANKING is the
    // contract, and the gap between target-like and off-target is real.
    assert(prod(1L) > prod(2L) && prod(2L) > prod(3L))
  }

  test("every raw token occurrence is scored (n_tok = doc token count)") {
    spark.sparkContext.setLogLevel("ERROR")
    val raw = corpus()
    val target = raw.filter(col("doc_id") === 1L)
    val n = Selection.importanceWeights(raw, target, "doc_id", "text")
      .agg(sum("n_tok")).collect()(0).getLong(0)
    assert(n == 12L) // 3 docs x 4 tokens, none dropped by the model join
  }

  test("selectByBudget: score-desc greedy prefix cut, ties by id, all rows flagged") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // selection order: d1 (s=10), then the s=9 tie broken by id (d2 before
    // d3), then d4. cum: 5, 9, 12, 13 — budget 9 keeps exactly {d1, d2}.
    val docs = Seq((1L, 10L, 5L), (2L, 9L, 4L), (3L, 9L, 3L), (4L, 1L, 1L))
      .toDF("doc_id", "score", "n_tok")
    val out = Selection.selectByBudget(docs, "doc_id", col("score"),
        col("n_tok"), budget = 9L)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("cum_tok"), r.getAs[Boolean]("selected")))).toMap
    assert(out.size == 4)
    assert(out(1L) == ((5L, true)) && out(2L) == ((9L, true)))
    assert(out(3L) == ((12L, false)) && out(4L) == ((13L, false)))
    // the selected set is a contiguous prefix of the selection order:
    // once cum_tok exceeds the budget nothing later is selected
    assert(!out.values.exists { case (c, sel) => sel && c > 9L })
  }
}

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
}

package graft

import java.nio.file.Files
import graft.operators.IncrStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incrementally-maintained stats store must be indistinguishable from
  * a full-corpus aggregate: append == rebuild bit-for-bit, merged-sum
  * ratios (never mean-of-ratio), and a bounded artifact size. */
class IncrStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def reportRows(dir: String) =
    IncrStats.report(spark, dir)
      .select("source", "n_docs", "n_tokens", "min_tok", "max_tok", "stop_bp")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  test("5-batch incremental store == one-shot build == direct full aggregate") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text").localCheckpoint()

    val incr = Files.createTempDirectory("graft_istats_i").toString
    IncrStats.build(docs.filter(col("doc_id") % 5 === 0), incr)
    (1 to 4).foreach(i =>
      IncrStats.append(docs.filter(col("doc_id") % 5 === i), incr))

    val full = Files.createTempDirectory("graft_istats_f").toString
    IncrStats.build(docs, full)

    val got = reportRows(incr)
    assert(got == reportRows(full))

    // direct aggregate over the corpus, no store involved
    val want = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"),
        size(filter(split(col("text"), " "),
          t => t.isin(Seq("the", "a", "and", "of", "to", "in").map(lit): _*)))
          .cast("long").as("ns"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        min("nt").as("min_tok"), max("nt").as("max_tok"),
        expr("sum(ns) * 10000 div sum(nt)").as("stop_bp"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("ratios merge from raw sums, not means of per-batch ratios") {
    // batch 1: source s has 1 stop token of 10 (1000 bp);
    // batch 2: 9 of 90 (1000 bp) PLUS a doc with 0 of 100.
    // merged: 10 stop / 200 tokens = 500 bp; a mean-of-ratios pipeline
    // would report ~666-1000 bp. min/max span the batches.
    val d = Files.createTempDirectory("graft_istats_r").toString
    IncrStats.build(Seq((1L, "s", ("the " + "x " * 9).trim)).toDF("doc_id", "source", "text"), d)
    IncrStats.append(Seq(
      (2L, "s", ("the " * 9 + "x " * 81).trim),
      (3L, "s", ("x " * 100).trim)).toDF("doc_id", "source", "text"), d)
    assert(reportRows(d) == Set(("s", 3L, 200L, 10L, 100L, 500L)))
  }

  test("store size is O(sources x batches), not O(docs)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "text")
    val d = Files.createTempDirectory("graft_istats_b").toString
    IncrStats.build(docs.filter(col("doc_id") % 3 === 0), d)
    (1 to 2).foreach(i =>
      IncrStats.append(docs.filter(col("doc_id") % 3 === i), d))
    val nSources = docs.select("source").distinct().count()
    val partialRows = spark.read.parquet(s"$d/partials").count()
    assert(partialRows <= nSources * 3)
    assert(partialRows < docs.count())
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Diff

class DiffSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("snapshotDiff: full status truth table incl. NULL payloads and multi-column changes") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val v1 = Seq(
      (1L, Some("same"), "en"), (2L, Some("old text"), "en"),
      (3L, Some("gone"), "de"), (4L, None: Option[String], "fr"),
      (5L, Some("lang flips"), "en"))
      .toDF("id", "text", "lang")
    val v2 = Seq(
      (1L, Some("same"), "en"),          // unchanged
      (2L, Some("new text"), "en"),      // changed (text)
      (4L, None: Option[String], "fr"),  // unchanged with NULL payload
      (5L, Some("lang flips"), "de"),    // changed (second column)
      (6L, Some("brand new"), "en"))     // added
      .toDF("id", "text", "lang")
    val got = Diff.snapshotDiff(v1, v2, "id", Seq("text", "lang"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"), s"got $got")
    // summary adds up to the union of keys
    val sum = Diff.diffSummary(
        Diff.snapshotDiff(v1, v2, "id", Seq("text", "lang")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("snapshotDiff: NULL text vs empty text are both distinct keys' problem, not a crash") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // NULL and '' coalesce to the same fingerprint byte-stream by design —
    // document that equivalence (the oracle mirrors the same coalesce)
    val a = Seq((1L, None: Option[String])).toDF("id", "text")
    val b = Seq((1L, Some(""))).toDF("id", "text")
    val got = Diff.snapshotDiff(a, b, "id", Seq("text")).collect()
    assert(got.length == 1 && got(0).getString(1) == "unchanged")
  }
}

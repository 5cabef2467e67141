package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Fuzzy

class FuzzySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resolve(dirty: Seq[(Long, String)], canon: Seq[(Long, String)]) = {
    import spark.implicits._
    Fuzzy.resolveByEdit(
        dirty.toDF("id", "s"), "id", "s",
        canon.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("every single-edit kind is recovered; two edits are not") {
    spark.sparkContext.setLogLevel("ERROR")
    val canon = Seq(1L -> "warehouse-catalog", 2L -> "pipeline-registry")
    val dirty = Seq(
      10L -> "warehouse-catalog",   // exact (dist 0)
      11L -> "warehouse-cattlog",   // insertion mid-string
      12L -> "warehuse-catalog",    // deletion mid-string
      13L -> "Xarehouse-catalog",   // substitution at pos 0 (prefix broken, suffix block catches)
      14L -> "warehouse-cataloX",   // substitution at end (suffix broken, prefix block catches)
      15L -> "wErehouse-cAtalog")   // TWO substitutions — must not match
    val got = resolve(dirty, canon)
    assert(got == Set((10L, 1L, 0), (11L, 1L, 1), (12L, 1L, 1),
      (13L, 1L, 1), (14L, 1L, 1)), s"got $got")
  }

  test("short strings and the 2*blockLen boundary match across lengths via length blocks") {
    spark.sparkContext.setLogLevel("ERROR")
    // blockLen = 4: short regime < 8 chars, boundary at exactly 8
    val canon = Seq(1L -> "cats", 2L -> "12345678")      // len 4 and len 8
    val dirty = Seq(
      10L -> "cat",        // deletion, len 3 vs 4 (both short)
      11L -> "catsy",      // insertion, len 5 vs 4
      12L -> "1234567",    // len 7 (short) vs len 8 (long) — boundary straddle
      13L -> "123456789")  // len 9 (long) vs len 8 (long)
    val got = resolve(dirty, canon)
    assert(got == Set((10L, 1L, 1), (11L, 1L, 1), (12L, 2L, 1), (13L, 2L, 1)),
      s"got $got")
  }

  test("plan is blocked equi-joins — no cartesian, no nested loop") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, s"name-number-$i")).toDF("id", "s")
    val plan = Fuzzy.resolveByEdit(a, "id", "s", a, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay blocked:\n$plan")
  }
}

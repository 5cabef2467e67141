package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

/** As-of join truth table: inclusive tie, latest-wins, no-match null,
  * per-key isolation. */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asOfJoin: latest right at-or-before each left row, per key") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // k=100 t=10: rights at 3,7 -> 7 wins
      (2L, 7L, 100L),  // k=100 t=7: tie with right at 7 -> INCLUSIVE match
      (3L, 2L, 100L),  // k=100 t=2: before all rights -> null
      (4L, 10L, 200L)  // k=200 t=10: other key's rights invisible -> own right
    ).toDF("lid", "ts", "k").select($"lid", $"k", $"ts")
    val right = Seq(
      (100L, 11L, 3L, 0.3),
      (100L, 12L, 7L, 0.7),
      (100L, 13L, 7L, 0.9), // same (k, ts): higher rid wins deterministically
      (200L, 21L, 1L, 2.0))
      .toDF("k", "rid", "ts", "v")
    val got = AsOf.asOfJoin(left, right, "k", "ts", "rid", "v")
      .orderBy("lid")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got(0) == ((1L, Some(13L), Some(0.9)))) // latest (7) wins, rid 13 > 12
    assert(got(1) == ((2L, Some(13L), Some(0.9)))) // inclusive at equal ts
    assert(got(2) == ((3L, None, None)))           // nothing precedes
    assert(got(3) == ((4L, Some(21L), Some(2.0)))) // key isolation
  }

  test("asOfJoin: null right payload still pairs id and value from the same row") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("lid", "k", "ts")
    // latest right row (rid 12, ts 7) carries a NULL payload; an older row
    // (rid 11, ts 3) carries a value. The match must be (12, null) — never
    // the mismatched (12, 0.3) a per-column ignoreNulls carry would build.
    val right = Seq(
      (100L, 11L, 3L, Some(0.3)),
      (100L, 12L, 7L, Option.empty[Double]))
      .toDF("k", "rid", "ts", "v")
    val got = AsOf.asOfJoin(left, right, "k", "ts", "rid", "v").collect()(0)
    assert(got.getLong(3) == 12L)
    assert(got.isNullAt(4), s"expected null payload from rid 12, got $got")
  }

  test("asOfJoin plan: one key exchange, no nested-loop or cartesian") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val left = (1L to 100L).map(i => (i, i % 5, i * 2)).toDF("lid", "k", "ts")
    val right = (1L to 100L).map(i => (i % 5, i + 1000, i * 3, 0.5)).toDF("k", "rid", "ts", "v")
    val plan = AsOf.asOfJoin(left, right, "k", "ts", "rid", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

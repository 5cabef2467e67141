package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Banded range join: boundary inclusion, bucket-straddling pairs, tie
  * ordering, key isolation, and the no-nested-loop plan contract. */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("withinWindowPairs: window boundary, straddle, ties, key isolation") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // W = 10. Buckets: [0,10), [10,20), [20,30) ...
    val df = Seq(
      (1L, 0L, 10L),   // k=1
      (2L, 9L, 10L),   // same bucket as id 1, diff 9 <= 10 -> pair (1,2)
      (3L, 12L, 10L),  // next bucket: (1,3) diff 12 > 10 NO; (2,3) diff 3 -> pair
      (4L, 19L, 10L),  // (3,4) diff 7 -> pair; (2,4) diff EXACTLY 10 -> pair (inclusive)
      (5L, 40L, 10L),  // isolated in time -> no pairs
      (6L, 9L, 20L),   // other key: no cross-key pairs
      (7L, 9L, 20L))   // equal ts, same key: ordered by id -> pair (6,7)
      .toDF("id", "ts", "k")
    val got = RangeJoin.withinWindowPairs(df, "k", "ts", "id", window = 10L)
      .orderBy("id1", "id2")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L), (6L, 7L)))
  }

  test("salted band join: parity on a 90%-hot-key fixture, bounded task skew") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 90% of events on key 1, and all of key 1's events inside ONE 100-wide
    // bucket — the worst case: one (key, bucket) cell holds the corpus.
    val df = (1L to 2000L).map { i =>
      if (i % 10 != 0) (i, i % 97, 1L)      // hot key, ts in [0, 97)
      else (i, i * 13 % 5000, i % 7 + 2)    // cold keys spread out
    }.toDF("id", "ts", "k")
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3)))
        .sortBy(identity)
    val plain = canon(RangeJoin.withinWindowPairs(df, "k", "ts", "id", 100L))
    val salted = canon(RangeJoin.withinWindowPairs(df, "k", "ts", "id", 100L,
      nSalt = 8))
    assert(salted.length == plain.length && salted.sameElements(plain))

    // the hot cell's LATER side actually spreads: no (k, b, salt) group
    // holds more than 2x the even share of the hot cell's rows
    import org.apache.spark.sql.functions._
    val lateSalted = df.filter($"k" === 1L)
      .select(expr("ts div 100").as("b"),
        pmod(hash(monotonically_increasing_id()), lit(8)).as("s"))
      .groupBy("b", "s").count().collect().map(_.getLong(2))
    assert(lateSalted.length == 8, "hot cell not spread over all salts")
    val mean = lateSalted.sum / lateSalted.length
    assert(lateSalted.max <= 2 * mean,
      s"salted hot cell still skewed: ${lateSalted.mkString(",")}")
  }

  test("plan: hash equi-join on (key, bucket), no nested loop") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i * 7, i % 3)).toDF("id", "ts", "k")
    val plan = RangeJoin.withinWindowPairs(df, "k", "ts", "id", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}

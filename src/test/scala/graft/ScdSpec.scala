package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd

class ScdSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("scd2History: runs collapse, intervals abut, current run open, keys isolated") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), 1L, "bronze"), (1L, ts(20), 2L, "bronze"),
      (1L, ts(30), 3L, "gold"), (1L, ts(40), 4L, "bronze"),
      (2L, ts(15), 5L, "gold")) // second key: single open run
      .toDF("user_id", "ts", "event_id", "status")
    val h = Scd.scd2History(events, "user_id", "ts", "event_id", "status")
      .orderBy("user_id", "valid_from_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    assert(h.toSeq == Seq(
      (1L, "bronze", 10000000L, 30000000L, 2L), // two rows collapsed
      (1L, "gold", 30000000L, 40000000L, 1L),
      (1L, "bronze", 40000000L, -1L, 1L),       // value returns => NEW run
      (2L, "gold", 15000000L, -1L, 1L)), s"got ${h.toSeq}")
    // intervals abut exactly: each valid_to equals the next valid_from
  }

  test("asOf: point-in-time lookup honors half-open intervals and the open run") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), 1L, "bronze"), (1L, ts(30), 2L, "gold"))
      .toDF("user_id", "ts", "event_id", "status")
    val h = Scd.scd2History(events, "user_id", "ts", "event_id", "status")
    def at(us: Long) = Scd.asOf(h, us).select("value").collect().map(_.getString(0)).toSeq
    assert(at(9999999L) == Seq())            // before history
    assert(at(10000000L) == Seq("bronze"))   // inclusive start
    assert(at(29999999L) == Seq("bronze"))
    assert(at(30000000L) == Seq("gold"))     // exclusive end / new start
    assert(at(99999999L) == Seq("gold"))     // open current run
  }

  test("scd2History: one hash exchange — windows and agg share the per-key ordering") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val events = (1 to 200).map(i =>
      (i % 5L, ts(i * 10L), i.toLong, if ((i / 7) % 2 == 0) "a" else "b"))
      .toDF("user_id", "ts", "event_id", "status")
    val plan = Scd.scd2History(events, "user_id", "ts", "event_id", "status")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 hash exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") ||
      !plan.contains("Window"), "no global single-partition window allowed")
  }
}

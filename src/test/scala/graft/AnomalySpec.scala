package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("rollingZ: a lone spike flags exactly once; trailing windows absorb it; warm-up never flags") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // user 1: 40 steady readings of 10.00 with one 500.00 spike at event 30.
    // Algebra: at the spike row (n·x−S)² = (19(sp−c))² = 361(sp−c)² >
    // 9·(nQ−S²) = 9·19(sp−c)² — flagged. On later rows holding the spike in
    // frame, LHS = (sp−c)² < 9·19(sp−c)² — not flagged.
    // user 2: wild values but only 10 events — never a full window, no flag.
    val rows =
      (1 to 40).map(i => (1L, ts(i * 60L), i.toLong,
        if (i == 30) 500.0 else 10.0)) ++
      (1 to 10).map(i => (2L, ts(i * 60L), 100L + i,
        if (i % 2 == 0) 900.0 else 1.0))
    val out = Anomaly.rollingZ(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", n = 20, k2 = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val flagged = out.filter(_._3)
    assert(flagged.toSeq == Seq((1L, 30L * 60L * 1000000L, true)),
      s"exactly the spike row must flag, got ${flagged.toSeq}")
    // warm-up rows (first 19 of user 1, all of user 2) are never flagged
    assert(out.filter(_._1 == 2L).forall(!_._3))
  }

  test("rollingZ: constant stream (zero variance) never self-flags") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (1 to 30).map(i => (1L, ts(i * 60L), i.toLong, 42.0))
    val out = Anomaly.rollingZ(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value", n = 20, k2 = 9)
      .collect()
    // (n·x−S)² = 0 is NOT > 0 = k²·(nQ−S²): strict inequality keeps a flat
    // line clean even though its variance is zero
    assert(out.forall(!_.getBoolean(4)))
  }
}

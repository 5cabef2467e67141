package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin
import graft.streaming.StreamingRangeJoin

/** The watermarked stream-stream interval join must emit EXACTLY the batch
  * range join's pair set when the feed is replayed in order: closed-form
  * boundary/tie cases first, then the real event table in micro-batches
  * against RangeJoin.withinWindowPairs. */
class StreamingRangeJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Replay (key, ts_sec, id) slices as parquet micro-batches through the
    * streaming join (checkpointed state persists across the AvailableNow
    * drains); returns every appended (k, id1, id2) pair. */
  private def replay(batches: Seq[Seq[(Long, Long, Long)]], windowSec: Long,
                     delaySec: Long): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_srj").toString
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    batches.foreach { b =>
      b.toDF("k0", "ts_sec", "id0")
        .withColumn("ts", timestamp_seconds(col("ts_sec")))
        .select("k0", "ts", "id0")
        .coalesce(1).write.mode("append").parquet(s"$work/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$work/in").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in")
      val joined = StreamingRangeJoin.withinWindowPairsStream(
        src, "k0", "ts", "id0", windowSec, delaySec)
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/_cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          out ++= batch.select("k", "id1", "id2").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          ()
        }
        .start()
      q.awaitTermination()
    }
    out.toSet
  }

  test("closed-form: inclusive boundary, id tie-break at equal ts, keys never cross") {
    spark.sparkContext.setLogLevel("ERROR")
    // key 1: ts T+0, T+3600, T+7200, T+10800 (window 7200 inclusive);
    // key 1: ids 40/41 share T+3600 -> one ordered pair; key 2 isolated.
    // T is offset well past the epoch: Spark's initial global watermark is
    // epoch 0 and the stream-stream join's late-input filter is inclusive,
    // so an event AT the epoch itself is discarded as late (verified).
    val T = 1000000000L
    val evs = Seq((1L, T + 0L, 10L), (1L, T + 3600L, 40L),
      (1L, T + 3600L, 41L), (1L, T + 7200L, 20L), (1L, T + 10800L, 30L),
      (2L, T + 3600L, 99L))
    val got = replay(Seq(evs.take(3), evs.drop(3)), windowSec = 7200,
      delaySec = 86400)
    val want = Set(
      (1L, 10L, 40L), (1L, 10L, 41L), (1L, 10L, 20L),
      (1L, 40L, 41L), (1L, 40L, 20L), (1L, 41L, 20L),
      (1L, 40L, 30L), (1L, 41L, 30L), (1L, 20L, 30L))
    assert(got == want)
  }

  test("ordered replay of the event table == batch banded range join") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // whole-second ticks so the streaming interval predicate and the
    // batch integer banding compare identical quantities
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), (unix_micros(col("ts")) / 1000000L).cast("long").as("sec"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(r => (r._2, r._3))

    val want = RangeJoin.withinWindowPairs(
        rows.toDF("user_id", "sec", "event_id"), "user_id", "sec",
        "event_id", window = 7200)
      .select(col("k"), col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture must produce pairs")

    val slices = rows.grouped((rows.length + 3) / 4).map(_.toSeq).toSeq
    val got = replay(slices, windowSec = 7200, delaySec = 3600)
    assert(got == want)
  }
}

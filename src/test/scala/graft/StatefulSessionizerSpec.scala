package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize
import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.{SEvent, SSession}

/** The streaming sessionizer must reproduce the batch gaps-and-islands
  * result: replaying the sf0.001 event table as a sequence of time-ordered
  * micro-batches (files landing one at a time, AvailableNow + shared
  * checkpoint = one incremental run per file) emits exactly the batch
  * `sessionStats` rows once a far-future sentinel event per key forces the
  * last open session of every key closed. */
class StatefulSessionizerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("time-sliced replay emits exactly the batch session set") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val gapSeconds = 28800L
    val work = Files.createTempDirectory("graft_sess").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")

    val expected = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", gapSeconds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet

    val rows = ev.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .orderBy("ts_us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxTs = rows.map(_._2).max
    val sentinel = rows.map(_._1).distinct.sorted.zipWithIndex
      .map { case (k, i) => (k, maxTs + 2 * gapSeconds * 1000000L, 900000L + i) }
    val slices = rows.grouped((rows.length + 7) / 8).map(_.toSeq).toSeq :+ sentinel.toSeq

    val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long, Long)]
    val schema = spark.createDataset(Seq.empty[SEvent]).schema
    slices.zipWithIndex.foreach { case (slice, _) =>
      slice.toDF("key", "ts_us", "event_id")
        .coalesce(1).write.mode("append").parquet(s"$work/in")
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in")
        .as[SEvent]
      val closed = StatefulSessionizer.sessionizeStream(src, gapSeconds)
      val q = closed.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/_cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[SSession], _: Long) =>
          batch.collect().foreach { s =>
            got += ((s.key, s.session_idx, s.n_events,
              s.start_us, s.end_us, s.duration_us))
          }
          ()
        }
        .start()
      q.awaitTermination()
    }

    assert(got.toSet == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got.toSet -- expected).take(5)}")
  }

  test("crash-before-commit replay: batchId-keyed sink emits each session exactly once") {
    // VERDICT r9 #5 (the StatefulAnomalySpec discipline): delete the newest
    // commit marker after a clean run and restart — the replayed batch
    // re-emits deterministically into its own batch=<id> directory, so the
    // closed-session log is unchanged, duplicate-free.
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val gapSeconds = 28800L
    val work = Files.createTempDirectory("graft_sess_retry").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val expected = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", gapSeconds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sorted
    val rows = ev.select(col("user_id").as("key"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .orderBy("ts_us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxTs = rows.map(_._2).max
    val sentinel = rows.map(_._1).distinct.sorted.zipWithIndex
      .map { case (k, i) => (k, maxTs + 2 * gapSeconds * 1000000L, 900000L + i) }
    (rows.grouped((rows.length + 3) / 4).map(_.toSeq).toSeq :+ sentinel.toSeq)
      .foreach { slice =>
        slice.toDF("key", "ts_us", "event_id")
          .coalesce(1).write.mode("append").parquet(s"$work/in")
      }
    val schema = spark.createDataset(Seq.empty[SEvent]).schema
    def runStream(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in")
        .as[SEvent]
      val q = StatefulSessionizer.sessionizeStream(src, gapSeconds).writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/_cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[SSession], bid: Long) =>
          batch.toDF().write.mode("overwrite").parquet(s"$work/out/batch=$bid")
          ()
        }
        .start()
      q.awaitTermination()
    }
    runStream()
    def outRows() = spark.read.parquet(s"$work/out")
      .select("key", "session_idx", "n_events", "start_us", "end_us", "duration_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sorted
    assert(outRows().toSeq == expected.toSeq)
    val commits = new java.io.File(s"$work/_cp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.length >= 4, s"expected >=4 committed batches, got ${commits.length}")
    // drop the marker AND its local-FS checksum twin: a stale .N.crc makes
    // the replay's atomic rename fail as FileAlreadyExists
    val crc = new java.io.File(commits.last.getParentFile,
      "." + commits.last.getName + ".crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    runStream()
    assert(outRows().toSeq == expected.toSeq,
      "replayed batch changed or duplicated the session log")
  }
}

package graft

import java.nio.file.Files
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulXref

case class Ev(user_id: Long, event_id: Long, ts_us: Long, value: Double)

/** The flatMapGroupsWithState changelog formulation of the XREF upsert:
  * across multiple micro-batches the stream of per-key updates must converge
  * to the batch latest-by-key result, and superseded records must never be
  * re-emitted (update-mode changelog semantics). */
class StatefulXrefSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("update-mode changelog converges to batch latest-by-key") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_state").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    ev.withColumn("part", pmod(col("event_id"), lit(4)))
      .write.partitionBy("part").parquet(s"$work/in")

    val src = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")
      .as[Ev]

    val updates = StatefulXref.latestByKeyStream[Long, Ev](
      src, _.user_id, e => (e.ts_us, e.event_id))

    // capture the last update per key across all micro-batches
    val latest = TrieMap.empty[Long, Ev]
    val emitted = new java.util.concurrent.atomic.AtomicLong()
    val q = updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$work/_cp")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Ev], _: Long) =>
        batch.collect().foreach { e =>
          emitted.incrementAndGet()
          // update-mode invariant: each emission is strictly newer than what
          // we have seen for the key
          latest.get(e.user_id).foreach { prev =>
            assert(Ordering[(Long, Long)].lt(
              (prev.ts_us, prev.event_id), (e.ts_us, e.event_id)),
              s"non-monotonic update for key ${e.user_id}")
          }
          latest(e.user_id) = e
        }
        ()
      }
      .start()
    // stop on timeout: a silently-lingering query survives on the shared
    // session until JVM shutdown and dumps a decoy cancellation stack into
    // an otherwise-green test log (VERDICT r10 #8)
    if (!q.awaitTermination(120000)) q.stop()

    val expected = graft.operators.SttmOps
      .latestByKey(ev, Seq("user_id"), Seq("ts_us", "event_id"))
      .as[Ev].collect().map(e => e.user_id -> e).toMap
    assert(latest.size == expected.size)
    expected.foreach { case (k, e) =>
      assert(latest(k) == e, s"key $k: ${latest.get(k)} vs $e")
    }
    // changelog compaction: strictly fewer emissions than input rows
    assert(emitted.get() < ev.count())
  }

  test("state TTL evicts idle keys (older record accepted after expiry)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_ttl").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    val schema = implicitly[org.apache.spark.sql.Encoder[Ev]].schema

    val seen = TrieMap.empty[(Long, Long, Long), Boolean]
    // the file stream source lists only the top-level dir: stage each batch
    // and move its part file directly into in/ under a unique name
    def addBatch(name: String, rows: Seq[Ev]): Unit = {
      val stage = Files.createTempDirectory("graft_ttl_stage")
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$work/in/$name.parquet"))
    }
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(s"$work/in").as[Ev]
      val updates = StatefulXref.latestByKeyStream[Long, Ev](
        src, _.user_id, e => (e.ts_us, e.event_id), ttlMs = Some(500L))
      val q = updates.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$work/_cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Ev], _: Long) =>
          batch.collect().foreach(e => seen((e.user_id, e.ts_us, e.event_id)) = true)
          ()
        }
        .start()
      if (!q.awaitTermination(60000)) q.stop()
    }

    // batch 1: key 1 @ ts 100 enters state
    addBatch("b1", Seq(Ev(1L, 1L, 100L, 1.0)))
    runOnce()
    assert(seen.contains((1L, 100L, 1L)))

    // idle past the 500 ms TTL, then a batch touching ONLY key 2 — the
    // timeout for key 1 fires during this batch and evicts its state
    Thread.sleep(2000L)
    addBatch("b2", Seq(Ev(2L, 1L, 100L, 2.0)))
    runOnce()

    // key 1 again with an OLDER record: only accepted if state was evicted
    // (with live state the (50,1) < (100,1) ordering would suppress it)
    addBatch("b3", Seq(Ev(1L, 1L, 50L, 3.0)))
    runOnce()
    assert(seen.contains((1L, 50L, 1L)),
      "older record suppressed — TTL did not evict the key's state")
  }
}

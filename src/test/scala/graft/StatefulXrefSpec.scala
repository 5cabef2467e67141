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
    q.awaitTermination(120000)

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
}

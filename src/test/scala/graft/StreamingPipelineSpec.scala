package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SttmOps
import graft.streaming.{SnapshotStore, StreamingPipeline}
import graft.streaming.StreamingPipeline.XrefConfig

/** Streaming/batch parity: the micro-batch statement set (view -> xref
  * upsert -> enrich + quarantine) over a file stream must converge to the
  * same XREF snapshot as the batch latest-by-key over the full input —
  * the upsert-changelog semantics of the reference's Flink jobs. */
class StreamingPipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("micro-batch xref snapshot equals batch latest-by-key; sinks fan out") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_stream").toString
    val ev = Tables.events(spark, dir)

    // split the input into 3 files so AvailableNow + maxFilesPerTrigger=1
    // yields multiple micro-batches (out-of-order upserts across batches)
    ev.withColumn("part", pmod(col("event_id"), lit(3)))
      .write.partitionBy("part").parquet(s"$work/in")
    val source = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")

    val cust = Tables.customer(spark, dir)
    def view(b: DataFrame): DataFrame =
      b.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    def enrich(v: DataFrame, snap: DataFrame): DataFrame =
      snap.join(cust, snap("user_id") === cust("c_custkey"), "left")
        .select(col("user_id"), col("event_id"), col("c_mktsegment"))
    def quarantine(v: DataFrame, snap: DataFrame): DataFrame =
      v.join(cust, v("user_id") === cust("c_custkey"), "left_anti")
        .select(col("user_id"), col("event_id"))

    val q = StreamingPipeline.run(
      source, view,
      XrefConfig(Seq("user_id"), Seq("ts", "event_id")),
      enrich, quarantine, work)
    q.awaitTermination(120000)

    val snapshot = new SnapshotStore(s"$work/xref_snapshot").read(spark).get
    val expected = SttmOps.latestByKey(view(ev), Seq("user_id"), Seq("ts", "event_id"))
    assert(snapshot.count() == expected.count())
    val joined = snapshot.select(col("user_id"), col("event_id").as("got"))
      .join(expected.select(col("user_id"), col("event_id").as("want")), Seq("user_id"))
    assert(joined.filter(col("got") =!= col("want")).count() == 0)

    // fan-out sinks produced output (enrich rewritten per batch = appended)
    assert(spark.read.parquet(s"$work/fgac_out").count() > 0)
    // restart with no new files: snapshot unchanged (idempotent resume)
    val q2 = StreamingPipeline.run(
      source, view, XrefConfig(Seq("user_id"), Seq("ts", "event_id")),
      enrich, quarantine, work)
    q2.awaitTermination(60000)
    val snapshot2 = new SnapshotStore(s"$work/xref_snapshot").read(spark).get
    assert(snapshot2.count() == expected.count())
  }
}

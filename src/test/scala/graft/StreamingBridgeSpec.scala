package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.compile.{DemoSpecs, PipelineCompiler, StreamingBridge}
import graft.streaming.{ChangelogSink, SnapshotStore, StreamingPipeline}

/** The workbook-compiled streaming statement set (StreamingBridge) must
  * converge to the compiled BATCH runner's results table-for-table: the
  * XREF snapshot equals the batch latest-by-key, and the FGAC/quarantine
  * changelog sinks — which emit per-batch upsert DELTAS — accumulate
  * exactly the batch outputs' key sets (customer is static, so a key's
  * enrichment/quarantine verdict never changes across batches). */
class StreamingBridgeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("compiled statement set streams to the batch runner's results") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_bridge").toString

    // batch reference: the compiled pipeline's own run()
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    val pipeline = PipelineCompiler.compile(
      DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions)
    val batchOut = pipeline.run(spark)

    // streamed: 4 micro-batches through the bridge, dedicated session
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    Tables.events(spark, dir)
      .withColumn("part", pmod(col("event_id"), lit(4)))
      .write.partitionBy("part").parquet(s"$work/in")
    Tables.customer(s2, dir).createOrReplaceTempView("customer")
    val set = StreamingBridge.toStatementSet(pipeline, "events", s2, nBuckets = 4)
    val source = s2.readStream
      .schema(s2.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")
    val q = StreamingPipeline.runSet(source, set, work)
    val finished = q.awaitTermination(300000)
    if (!finished) q.stop()
    assert(finished, "streaming query did not terminate within 300 s — " +
      "asserting against partial results would mask the hang")

    // XREF snapshot == batch XREF (value-level, keyed)
    val snap = new SnapshotStore(
      StreamingPipeline.xrefStorePath(work, "XREF_USER")).read(s2).get
    val want = batchOut("XREF_USER")
    assert(snap.count() == want.count())
    val joined = snap.select(col("USER_ID"), col("EVENT_ID").as("got"))
      .join(want.select(col("USER_ID"), col("EVENT_ID").as("exp")), Seq("USER_ID"))
    assert(joined.filter(col("got") =!= col("exp")).count() == 0)

    // FGAC changelog: every final key delivered (delta semantics), masked
    // name matches the batch FGAC for each key's final row
    val fgac = ChangelogSink.read(s2, StreamingPipeline.sinkPath(work, "FGAC_USER_REF"))
    assert(fgac.select("USER_ID").distinct().count() == want.count())
    val lastPerKey = graft.operators.SttmOps.latestByKey(
      fgac, Seq("USER_ID"), Seq("batch"))
    val fj = lastPerKey.select(col("USER_ID"), col("C_NAME_MASKED").as("got"))
      .join(batchOut("FGAC_USER_REF")
        .select(col("USER_ID"), col("C_NAME_MASKED").as("exp")), Seq("USER_ID"))
    assert(fj.filter(not(col("got") <=> col("exp"))).count() == 0)

    // quarantine changelog: exactly the batch quarantine key set
    val quar = ChangelogSink.read(s2, StreamingPipeline.sinkPath(work, "QUAR_USER"))
    val gotKeys = quar.select("USER_ID").distinct()
    val expKeys = batchOut("QUAR_USER").select("USER_ID").distinct()
    assert(gotKeys.count() == expKeys.count())
    assert(gotKeys.join(expKeys, Seq("USER_ID"), "left_anti").count() == 0)
  }
}

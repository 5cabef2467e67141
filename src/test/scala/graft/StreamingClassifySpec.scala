package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classify
import graft.streaming.StreamingClassify

/** Online trained-filter gate: a document feed replayed in micro-batches
  * against the STORED weight artifact must keep exactly the rows the
  * one-shot batch filter keeps — scoring is per-document independent and
  * the weights are static, so batching cannot change any keep decision. */
class StreamingClassifySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stored weights round-trip: load == trained table, scores identical") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = Classify.trainLinear(docs.filter(col("doc_id") % 5 === 0),
      col("lang") === "en", "text")
    val dir = Files.createTempDirectory("graft_clsw").toString
    Classify.saveWeights(w, dir)
    assert(Classify.weightsExist(dir))
    val loaded = Classify.loadWeights(spark, dir)
    val a = w.collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val b = loaded.collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(a == b, "weight artifact round-trip changed the model")
    // serving through the artifact == serving the in-memory table
    val rest = docs.filter(col("doc_id") % 5 =!= 0)
    val inline = Classify.scoreLinear(rest, "doc_id", "text", w)
      .collect().map(_.toSeq).toSet
    val stored = Classify.scoreLinear(rest, "doc_id", "text", loaded)
      .collect().map(_.toSeq).toSet
    assert(inline == stored, "stored-weights scoring diverged from inline")
  }

  test("weight refresh between micro-batches takes effect without a restart") {
    // the scaladoc claim: the artifact is re-read per micro-batch, so
    // Classify.saveWeights mid-stream changes the NEXT batch's verdicts
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wDir = Files.createTempDirectory("graft_wref").toString
    // model A keeps "alpha" docs; model B keeps "beta" docs
    val trainA = Seq((true, "alpha alpha"), (false, "beta beta"))
      .toDF("y", "text")
    Classify.saveWeights(Classify.trainLinear(trainA, col("y"), "text"), wDir)
    val docs = Seq((1L, "alpha doc"), (2L, "beta doc")).toDF("doc_id", "text")
    val keptA = StreamingClassify.gateBatch(docs, "doc_id", "text", wDir)
      .collect().map(_.getLong(0)).toSet
    assert(keptA == Set(1L), s"model A must keep only alpha: $keptA")
    Classify.saveWeights(
      Classify.trainLinear(trainA, !col("y"), "text"), wDir)
    val keptB = StreamingClassify.gateBatch(docs, "doc_id", "text", wDir)
      .collect().map(_.getLong(0)).toSet
    assert(keptB == Set(2L),
      s"refreshed model B must keep only beta without a restart: $keptB")
  }

  test("streamed micro-batch filtering == one-shot batch filtering, bit-for-bit") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val wDir = Files.createTempDirectory("graft_scls_w").toString
    Classify.saveWeights(
      Classify.trainLinear(docs.filter(col("doc_id") % 5 === 0),
        col("lang") === "en", "text"), wDir)

    val feed = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") < 100)
      .select("doc_id", "text")
    val batchKept = StreamingClassify
      .gateBatch(feed, "doc_id", "text", wDir)
      .collect().map(_.toSeq).toSet
    assert(batchKept.nonEmpty, "fixture must keep at least one row")
    assert(batchKept.size < feed.count(), "fixture must drop at least one row")

    // replay the same feed as 3 file micro-batches through filterStream
    val work = Files.createTempDirectory("graft_scls").toString
    val rows = feed.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    import spark.implicits._
    rows.grouped((rows.size + 2) / 3).foreach { slice =>
      slice.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$work/in")
    }
    val src = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")
    val q = StreamingClassify.filterStream(src, "doc_id", "text", wDir,
      s"$work/out", s"$work/_cp", trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val streamed = StreamingClassify.kept(spark, s"$work/out")
      .select("doc_id", "text").collect().map(_.toSeq)
    assert(streamed.length == streamed.toSet.size,
      "a kept row was appended twice")
    assert(streamed.toSet == batchKept,
      s"missing=${(batchKept -- streamed.toSet).map(_.head)} " +
        s"extra=${(streamed.toSet -- batchKept).map(_.head)}")

    // effectively-exactly-once: re-running a batch's sink action (the
    // retry-after-crash shape) replaces its batchId-keyed output
    val firstSlice = rows.take((rows.size + 2) / 3).toDF("doc_id", "text")
    StreamingClassify.gateBatch(firstSlice, "doc_id", "text", wDir)
      .write.mode("overwrite").parquet(s"$work/out/batch=0")
    val retried = StreamingClassify.kept(spark, s"$work/out")
      .select("doc_id", "text").collect().map(_.toSeq)
    assert(retried.toSet == batchKept && retried.length == streamed.length,
      "a retried micro-batch changed the kept log")
  }
}

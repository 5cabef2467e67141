package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AnnIndexStore
import graft.streaming.StreamingAnn

/** Online ANN serving: a query-vector feed replayed in micro-batches
  * against the STORED IVF-PQ index must produce exactly the one-shot
  * batch answer — batching the feed cannot change any (qid, rank, nid,
  * dist) row, because serving is per-query independent and the index is
  * static. */
class StreamingAnnSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed micro-batch serving == one-shot batch serving, bit-for-bit") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idxDir = Files.createTempDirectory("graft_sann_idx").toString
    AnnIndexStore.build(corpus, "vec_id", "embedding", idxDir, dim = 64)

    val queryRows = corpus.filter(col("vec_id") < 9)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    // ground truth: ONE batch answer over the whole query set
    val batchAns = AnnIndexStore.query(
        queryRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        idxDir, kNN = 3, nProbe = 2, refine = 10)
      .collect().map(_.toSeq).toSet
    assert(batchAns.size == 9 * 3, s"expected 27 answer rows, got ${batchAns.size}")

    // replay the same queries as 3 file micro-batches through serveStream
    val work = Files.createTempDirectory("graft_sann").toString
    queryRows.grouped(3).foreach { slice =>
      slice.toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$work/in")
    }
    val src = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")
    val q = StreamingAnn.serveStream(src, "vec_id", "embedding", idxDir,
      s"$work/out", s"$work/_cp", kNN = 3, nProbe = 2, refine = 10,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val streamed = StreamingAnn.answers(spark, s"$work/out")
      .collect().map(_.toSeq)
    assert(streamed.length == streamed.toSet.size, "an answer row was appended twice")
    assert(streamed.toSet == batchAns,
      s"missing=${batchAns -- streamed.toSet} extra=${streamed.toSet -- batchAns}")

    // effectively-exactly-once: re-running a batch's sink action (the
    // retry-after-crash shape) must REPLACE its batchId-keyed output, not
    // double-append — the log is unchanged row-for-row
    val oneBatch = queryRows.take(3).toDF("vec_id", "embedding")
    StreamingAnn.answerBatch(oneBatch, "vec_id", "embedding", idxDir,
        kNN = 3, nProbe = 2, refine = 10)
      .write.mode("overwrite").parquet(s"$work/out/batch=0")
    val retried = StreamingAnn.answers(spark, s"$work/out")
      .collect().map(_.toSeq)
    assert(retried.toSet == batchAns && retried.length == streamed.length,
      "a retried micro-batch changed the served answer log")
  }

  test("streamed kNN labeling == one-shot batch labeling, bit-for-bit") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idxDir = Files.createTempDirectory("graft_slab_idx").toString
    AnnIndexStore.build(corpus, "vec_id", "embedding", idxDir, dim = 64)
    val work = Files.createTempDirectory("graft_slab").toString
    corpus.select("vec_id", "label")
      .write.mode("overwrite").parquet(s"$work/labels")

    val queryRows = corpus.filter(col("vec_id") < 9)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batchAns = AnnIndexStore.knnClassify(
        queryRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        idxDir, spark.read.parquet(s"$work/labels"), "vec_id", "label",
        k = 5, nProbe = 2, refine = 30)
      .collect().map(_.toSeq).toSet
    assert(batchAns.size == 9, s"one verdict per query: ${batchAns.size}")

    queryRows.grouped(3).foreach { slice =>
      slice.toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$work/in")
    }
    val src = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")
    val q = StreamingAnn.labelStream(src, "vec_id", "embedding", idxDir,
      s"$work/labels", "vec_id", "label", s"$work/out", s"$work/_cp",
      k = 5, nProbe = 2, refine = 30, trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val streamed = StreamingAnn.answers(spark, s"$work/out")
      .collect().map(_.toSeq)
    assert(streamed.length == streamed.toSet.size,
      "a verdict row was appended twice")
    assert(streamed.toSet == batchAns,
      s"missing=${batchAns -- streamed.toSet} extra=${streamed.toSet -- batchAns}")

    // retry shape (VERDICT r9 #5): re-running a batch's labeling sink
    // action replaces its batchId-keyed output, log unchanged
    AnnIndexStore.knnClassify(
        queryRows.take(3).toDF("vec_id", "embedding"), "vec_id", "embedding",
        idxDir, spark.read.parquet(s"$work/labels"), "vec_id", "label",
        k = 5, nProbe = 2, refine = 30)
      .write.mode("overwrite").parquet(s"$work/out/batch=0")
    val retried = StreamingAnn.answers(spark, s"$work/out")
      .collect().map(_.toSeq)
    assert(retried.toSet == batchAns && retried.length == streamed.length,
      "a retried labeling micro-batch changed the verdict log")
  }

  test("vector gate-and-maintain: duplicates drop, survivors screen later batches") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idxDir = Files.createTempDirectory("graft_vgate_idx").toString
    AnnIndexStore.build(corpus.filter(col("vec_id") % 20 =!= 0),
      "vec_id", "embedding", idxDir, dim = 64)
    val floor = 1350000L
    val incoming = corpus.filter(col("vec_id") % 20 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    // batch 1: the expected verdict is the direct matchBatchVectors one
    val b1 = incoming.toDF("vec_id", "embedding")
    val expectKeep = AnnIndexStore.matchBatchVectors(b1, "vec_id",
        "embedding", idxDir, floor)
      .filter(!col("is_dup")).select("new_id")
      .collect().map(_.getLong(0)).toSet
    val kept1 = StreamingAnn.gateAndMaintainVectors(idxDir, b1,
        "vec_id", "embedding", floor)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept1 == expectKeep && kept1.nonEmpty && kept1.size < incoming.size,
      s"gate verdict diverged or is vacuous: kept ${kept1.size}/${incoming.size}")

    // batch 2: verbatim copies of batch-1 survivors under fresh ids must
    // ALL drop — the survivors were appended, so the gate now knows them
    val copies = incoming.filter(r => kept1(r._1))
      .map { case (id, v) => (id + 1000000L, v) }
    val kept2 = StreamingAnn.gateAndMaintainVectors(idxDir,
        copies.toDF("vec_id", "embedding"), "vec_id", "embedding", floor)
      .count()
    assert(kept2 == 0L,
      s"$kept2 copies of already-accepted vectors slipped the gate")
  }

  test("vector gate retry (same batchId) reproduces survivors, store unchanged") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idxDir = Files.createTempDirectory("graft_vgate_retry").toString
    AnnIndexStore.build(corpus.filter(col("vec_id") % 20 =!= 0),
      "vec_id", "embedding", idxDir, dim = 64)
    val floor = 1350000L
    val b1 = corpus.filter(col("vec_id") % 20 === 0).localCheckpoint()

    val kept = StreamingAnn.gateAndMaintainVectors(idxDir, b1,
        "vec_id", "embedding", floor, batchId = Some(5L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && AnnIndexStore.batchApplied(idxDir, 5L))
    val stored = AnnIndexStore
      .batchVecIds(spark, idxDir, 5L).count()

    // the retry-after-crash shape: the engine re-runs the same batchId
    // AFTER the index append committed. Without replay detection every
    // survivor would now match ITSELF in the store and be gated out,
    // permanently losing the batch; with it the committed survivor set is
    // reproduced and nothing is double-appended.
    val retried = StreamingAnn.gateAndMaintainVectors(idxDir, b1,
        "vec_id", "embedding", floor, batchId = Some(5L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(retried == kept,
      s"retry diverged: missing=${kept -- retried} extra=${retried -- kept}")
    assert(AnnIndexStore.batchVecIds(spark, idxDir, 5L).count() == stored,
      "retry changed the stored segment")
  }
}

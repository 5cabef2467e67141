package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

/** Ingest-time dedup: replaying the event table with every record
  * duplicated in-batch AND the tail of each batch repeated at the head of
  * the next (the at-least-once redelivery shapes), each event_id must be
  * emitted exactly once. */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("duplicated replay emits each event exactly once") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_sdedup").toString
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .orderBy("ts_us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val slices = rows.grouped((rows.length + 3) / 4).map(_.toSeq).toSeq
    // each slice: every row twice, plus the previous slice's last 10 rows
    val batches = slices.zipWithIndex.map { case (s, i) =>
      val redelivered = if (i == 0) Seq.empty else slices(i - 1).takeRight(10)
      s ++ s ++ redelivered
    }

    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    batches.foreach { b =>
      b.toDF("event_id", "ts_us")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .coalesce(1).write.mode("append").parquet(s"$work/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$work/in").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in")
      val deduped = StreamingDedup.dedupStream(src, Seq("event_id"), "ts", "1 hour")
      val q = deduped.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/_cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted ++= batch.select("event_id").collect().map(_.getLong(0))
          ()
        }
        .start()
      q.awaitTermination()
    }

    assert(emitted.size == rows.length,
      s"expected ${rows.length} unique emissions, got ${emitted.size}")
    assert(emitted.toSet == rows.map(_._1).toSet)
  }

  test("near-dup gate: streamed micro-batches pass exactly the batch-mode survivors") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_ndgate").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
      .select("doc_id", "text").localCheckpoint()
    val incomingRows = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // ground truth: one batch-mode gate over the whole incoming set
    val batchKept = StreamingDedup.nearDupGate(existing,
        incomingRows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < incomingRows.size,
      s"fixture should both keep and drop docs (kept ${batchKept.size}/${incomingRows.size})")

    // stream the incoming docs in 3 micro-batches through the same gate
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    incomingRows.grouped((incomingRows.size + 2) / 3).foreach { slice =>
      slice.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$work/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$work/in").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$work/in")
      val q = src.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/_cp")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          kept ++= StreamingDedup.nearDupGate(existing, batch, "doc_id", "text")
            .select("doc_id").collect().map(_.getLong(0))
          ()
        }
        .start()
      q.awaitTermination()
    }
    // batch split cannot change the verdict: the gate is per-doc vs a
    // static index, so streamed survivors == batch survivors exactly
    assert(kept.toSet == batchKept, s"missing=${batchKept -- kept.toSet} extra=${kept.toSet -- batchKept}")
    assert(kept.size == kept.toSet.size, "a doc was emitted twice")
  }

  test("near-dup gate at sf0.1: 20 micro-batches vs the stored index == batch survivors") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val incomingRows = docs.filter(col("doc_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val idxDir = Files.createTempDirectory("graft_ndgate_idx").toString
    graft.operators.DedupIndex.build(existing, "doc_id", "text", idxDir)

    // ground truth: ONE batch gate over the whole incoming set, same index
    val batchKept = StreamingDedup.nearDupGate(idxDir,
        incomingRows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < incomingRows.size,
      s"fixture should both keep and drop docs (kept ${batchKept.size}/${incomingRows.size})")

    // 20 micro-batches through the index-backed gate (foreachBatch shape;
    // driving the gate directly per-slice — the streaming-source plumbing
    // itself is covered by the 3-batch case above)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val batchTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    incomingRows.grouped((incomingRows.size + 19) / 20).foreach { slice =>
      val t0 = System.nanoTime()
      kept ++= StreamingDedup.nearDupGate(idxDir,
          slice.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0))
      batchTimes += (System.nanoTime() - t0) / 1e9
    }
    info(f"per-batch wall: median ${batchTimes.sorted.apply(batchTimes.size / 2)}%.2f s " +
      f"max ${batchTimes.max}%.2f s over ${batchTimes.size} batches")
    assert(kept.toSet == batchKept,
      s"missing=${batchKept -- kept.toSet} extra=${kept.toSet -- batchKept}")
    assert(kept.size == kept.toSet.size, "a doc was emitted twice")
  }
}

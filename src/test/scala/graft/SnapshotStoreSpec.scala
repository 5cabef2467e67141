package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SnapshotStore

/** LSM discipline of the XREF snapshot store (VERDICT r10 #1/#6): per-batch
  * write cost must track |batch| + amortized compaction — NOT snapshot
  * size — and resharding must be a bit-identical rewrite that leaves
  * in-flight readers unharmed. */
class SnapshotStoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def du(root: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(root)
    if (!Files.exists(p)) Map.empty
    else {
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(q => q.toString.endsWith(".parquet") && Files.isRegularFile(q))
        .map(q => q.toString -> Files.size(q)).toMap
      finally walk.close()
    }
  }

  test("write amplification: per-batch bytes track |batch|, not snapshot size") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_amp").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 8, maxLiveSegments = 4)
    val nBatches = 12
    val batchKeys = 200
    // every batch carries 200 FRESH keys -> the snapshot grows 12x over the
    // run while batch size stays constant; keys are hash-spread so every
    // batch touches ~all 8 buckets (the regime that made the old
    // touched-bucket REWRITE an O(snapshot) write per trigger)
    var folds = 0
    val perBatchNewBytes = (0 until nBatches).map { i =>
      val before = du(s"$work/snap")
      val segsBefore = store.liveSegments.length
      val b = (0 until batchKeys)
        .map(j => (i.toLong * 100000 + j, 1L, s"v$i-$j"))
        .toDF("k", "ts", "v")
      store.merge(b, Seq("k"), Seq("ts"), batchId = Some(i.toLong))
      val after = du(s"$work/snap")
      val folded = store.liveSegments.length <= segsBefore
      if (folded) folds += 1
      // append-only between folds: nothing pre-existing is rewritten
      // (and even a FOLD never rewrites — folded dirs are retained, the
      // merged tier is a new dir — but a fold batch legitimately writes
      // more than |batch|, so it is excluded from the flatness assert)
      assert(before.keySet.subsetOf(after.keySet))
      before.keySet.foreach(p => assert(before(p) == after(p)))
      val newBytes = after.keySet.diff(before.keySet).map(after).sum
      (newBytes, folded)
    }
    // tiered cadence: a MINOR fold roughly every 4 appends (budget 4),
    // not never and not every batch; 12 batches never accumulate 4 merged
    // tiers, so the O(snapshot) base rewrite must not have fired (no base)
    assert(folds >= 2 && folds <= 4, s"folds=$folds")
    assert(store.liveSegments.count(_ == "base") == 0,
      s"major compaction fired too early: ${store.liveSegments}")
    assert(store.liveSegments.count(_.startsWith("m-")) == folds)
    val appendBytes = perBatchNewBytes.collect { case (n, false) => n }
    assert(appendBytes.size >= 6)
    // THE r10 #1 assertion: append cost is flat while the snapshot grows
    // 12x — the last plain append writes no more than 2x the first, and
    // far less than the accumulated snapshot
    assert(appendBytes.max <= 2 * appendBytes.min,
      s"append bytes not flat: $appendBytes")
    val snapshotBytes = du(s"$work/snap").values.sum
    assert(appendBytes.max < snapshotBytes / 3,
      s"append ${appendBytes.max} not << snapshot $snapshotBytes")
    // and the data is right: 2400 distinct keys, merge-on-read serves all
    assert(store.read(spark).get.count() == (nBatches * batchKeys).toLong)
  }

  test("batchId-keyed append is replay-idempotent at the store level") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_replay").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4)
    val b = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ts", "v")
    val touched = store.merge(b, Seq("k"), Seq("ts"), batchId = Some(7L))
    val before = du(s"$work/snap")
    // replay of an already-committed batchId: same touched report, ZERO new
    // files, snapshot unchanged
    val touched2 = store.merge(b, Seq("k"), Seq("ts"), batchId = Some(7L))
    assert(touched2 == touched)
    assert(du(s"$work/snap") == before)
    assert(store.read(spark).get.count() == 2)
  }

  test("compaction folds segments into a deduped base; values unchanged") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_compact").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4, maxLiveSegments = 64)
    store.merge((0 until 50).map(k => (k.toLong, 1L, s"v$k")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))
    store.merge(Seq((3L, 2L, "v3-new"), (60L, 1L, "v60")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))
    val before = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before(3L) == "v3-new" && before(60L) == "v60" && before.size == 51)
    store.compact(spark)
    assert(store.liveSegments == Vector("base"))
    val after = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after == before)
    // post-compaction the base is deduped on disk: raw file rows == keys
    // (g0 compacted into g1; read the base table directly, bypassing the
    // store's merge-on-read)
    assert(spark.read.parquet(s"$work/snap/g1/base/rows").count() == 51)
  }

  test("tiered compaction: minor folds never touch the base; major fires at the merged budget") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_tier").toString
    // budget 2: a minor fold every 3rd append, a major when 2 merged tiers
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4, maxLiveSegments = 2)
    def appendBatch(i: Int): Unit =
      store.merge((0 until 50).map(j => (i.toLong * 1000 + j, 1L, s"v$i-$j"))
        .toDF("k", "ts", "v"), Seq("k"), Seq("ts"), batchId = Some(i.toLong))

    // build a base first so minor folds have a base NOT to touch
    (0 until 3).foreach(appendBatch) // 3 fresh > 2 -> fold -> [m1]
    store.compact(spark)             // -> [base]
    assert(store.liveSegments == Vector("base"))
    val baseFiles = du(s"$work/snap").filter(_._1.contains("/base/"))

    (3 until 6).foreach(appendBatch) // fold #2 -> [base, m2]
    assert(store.liveSegments.count(_.startsWith("m-")) == 1,
      s"segs=${store.liveSegments}")
    // the minor fold did NOT rewrite the base: same files, same bytes
    val baseAfter = du(s"$work/snap").filter(_._1.contains("/base/"))
    assert(baseAfter == baseFiles, "minor fold must not touch the base")
    // folded fresh dirs are retained on disk for pinned readers
    assert(du(s"$work/snap").keys.exists(_.contains("/b3/")),
      "folded segment dirs must be retained for pinned readers")

    (6 until 9).foreach(appendBatch) // fold #3 -> merged count 2 == budget
    appendBatch(9)                   // next append sees 2 merged -> MAJOR
    assert(store.liveSegments.count(_ == "base") == 1)
    assert(store.liveSegments.count(_.startsWith("m-")) == 0,
      s"major compact should fold the merged tiers: ${store.liveSegments}")

    // all 10 batches' keys served exactly once with the right values
    val got = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 10 * 50)
    assert(got(0L) == "v0-0" && got(9L * 1000 + 49) == "v9-49")
  }

  test("replay of a FOLDED batchId is a no-op: retained dir untouched, no new segment") {
    // ADVICE r11 #2: a replayed batch whose b<id> segment was minor-folded
    // must not overwrite the retained directory (a reader pinned to the
    // pre-fold manifest may be scanning it) — the fold's watermark makes
    // the replay append-side no-op while still reporting touched buckets.
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_foldreplay").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4, maxLiveSegments = 2)
    def batch(i: Int) = (0 until 20).map(j => (i.toLong * 100 + j, 1L, s"v$i-$j"))
      .toDF("k", "ts", "v")
    (0 until 3).foreach(i => store.merge(batch(i), Seq("k"), Seq("ts"),
      batchId = Some(i.toLong)))           // 3 fresh > 2 -> fold -> [m-*]
    assert(store.liveSegments.forall(_.startsWith("m-")),
      s"expected folded state, got ${store.liveSegments}")
    assert(du(s"$work/snap").keys.exists(_.contains("/b1/")),
      "folded b<id> dirs must be retained")
    val before = du(s"$work/snap")
    val segsBefore = store.liveSegments
    // replay a FOLDED batch: bytes on disk identical (no overwrite of the
    // retained dir, no junk segment), manifest unchanged, buckets reported
    val touched = store.merge(batch(1), Seq("k"), Seq("ts"), batchId = Some(1L))
    assert(touched.nonEmpty)
    assert(du(s"$work/snap") == before, "folded replay must not write")
    assert(store.liveSegments == segsBefore)
    assert(store.read(spark).get.count() == 60)
  }

  test("single live segment skips the merge-on-read aggregation") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_oneseg").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4, maxLiveSegments = 64)
    store.merge(Seq((1L, 2L, "new"), (1L, 1L, "old"), (2L, 1L, "b"))
      .toDF("k", "ts", "v"), Seq("k"), Seq("ts"), batchId = Some(0L))
    def aggs(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size
    // one delta segment: written deduped within the batch, so the read is a
    // plain scan — no latest-by-key shuffle
    val one = store.read(spark).get
    assert(aggs(one) == 0, "single-segment read should skip latestByKey")
    assert(one.collect().map(r => r.getLong(0) -> r.getString(2)).toMap ==
      Map(1L -> "new", 2L -> "b"))
    // two segments: cross-segment dedup must come back
    store.merge(Seq((2L, 2L, "b2")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"), batchId = Some(1L))
    val two = store.read(spark).get
    assert(aggs(two) == 1, "multi-segment read must dedup latest-by-key")
    assert(two.collect().map(r => r.getLong(0) -> r.getString(2)).toMap ==
      Map(1L -> "new", 2L -> "b2"))
  }

  test("a pre-v3 _META fails loud instead of reading as an absent store") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_prev3").toString
    Files.createDirectories(Paths.get(s"$work/snap"))
    // the pre-LSM layout's manifest shape — unparseable as v3
    Files.writeString(Paths.get(s"$work/snap/_META"), "nBuckets=16")
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4)
    val e = intercept[RuntimeException] { store.read(spark) }
    assert(e.getMessage.contains("pre-v3"))
    // the merge path must refuse too — it would otherwise overwrite the
    // old manifest and silently orphan every pre-upgrade row
    val e2 = intercept[RuntimeException] {
      store.merge(Seq((1L, 1L, "a")).toDF("k", "ts", "v"), Seq("k"), Seq("ts"))
    }
    assert(e2.getMessage.contains("pre-v3"))
  }

  test("reshard advisory fires on >=4x layout drift and clears after resharding") {
    // VERDICT r11 #7: nothing told an operator WHEN a store outgrew its
    // bucket count. The advisory recommends a pow-2 count sized to the
    // byte target, with 4x hysteresis both ways so it never flaps.
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_advise").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 2, maxLiveSegments = 64)
    store.merge((0 until 200).map(k => (k.toLong, 1L, s"v$k" * 10))
      .toDF("k", "ts", "v"), Seq("k"), Seq("ts"))
    // probe the live byte count via a degenerate 1-byte target
    val bytes = store.reshardAdvice(targetBucketBytes = 1L).get.liveBytes
    assert(bytes > 0)
    // target an ~8-bucket layout: 8 >= 4x the current 2 -> advice stands
    val grow = store.reshardAdvice(targetBucketBytes = (bytes + 7) / 8)
    assert(grow.nonEmpty && grow.get.nBuckets == 2)
    val rec = grow.get.recommended
    assert(rec >= 8, s"expected >=8, got $rec")
    // within 4x -> silent (no flapping): a 2-bucket store vs a 4-bucket
    // ideal is mild drift, not actionable
    assert(store.reshardAdvice(targetBucketBytes = (bytes + 3) / 4).isEmpty)
    // act on the advice -> advice clears at the same target
    store.reshard(spark, rec)
    val after = new SnapshotStore(s"$work/snap")
    val bytes2 = after.reshardAdvice(targetBucketBytes = 1L).get.liveBytes
    assert(after.reshardAdvice(targetBucketBytes = (bytes2 + rec - 1) / rec).isEmpty)
    // and the shrink direction fires too: a target of ALL bytes in one
    // bucket makes the resharded layout >=4x too wide
    val shrink = after.reshardAdvice(targetBucketBytes = bytes2)
    assert(shrink.nonEmpty && shrink.get.recommended < rec)
    assert(after.read(spark).get.count() == 200)
  }

  test("reshard rewrites under a new bucket count, bit-identical, readers unharmed") {
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_snap_reshard").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4)
    store.merge((0 until 300).map(k => (k.toLong, 1L, s"v$k")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))
    store.merge((0 until 40).map(k => (k.toLong, 2L, s"w$k")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))
    val want = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap

    // an in-flight reader pins its file listing BEFORE the reshard
    val pinned = store.read(spark).get

    store.reshard(spark, 16)

    // racing reader: the pre-reshard plan still resolves (previous
    // generation retained) and returns the identical row set
    val pinnedRows = pinned.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pinnedRows == want)
    // post-reshard reads are bit-identical
    val after = store.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after == want)

    // the new layout really is 16-way: a single-key merge reports a bucket
    // id under the NEW count and its pruned read stays in that bucket
    val touched = store.merge(Seq((5L, 3L, "x5")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))
    assert(touched.size == 1)
    val pruned = store.readBuckets(spark, touched).get
    assert(pruned.inputFiles.nonEmpty)
    assert(pruned.inputFiles.forall(_.contains(s"_bucket=${touched.head}")))
    assert(pruned.filter(col("k") === 5L).select("v").as[String].head() == "x5")
    // and MORE granular than before: >4 distinct bucket dirs exist now
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(Paths.get(s"$work/snap"))
    val bucketDirs = try walk.iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("_bucket="))
      .map(_.getFileName.toString).toSet
    finally walk.close()
    assert(bucketDirs.size > 4, s"expected 16-way layout, saw $bucketDirs")

    // reopening with a stale constructor count still serves correctly: the
    // persisted (resharded) value wins
    val reopened = new SnapshotStore(s"$work/snap", nBuckets = 4)
    assert(reopened.read(spark).get.count() == 300)
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Reshard-vs-append race (the round-11 review finding): a batch PREPARED
  * under one bucket count must never commit after a reshard changed the
  * layout — its `_bucket` tags would be derived under the old count and the
  * rows invisible to every read until the next compaction. In the package
  * so it can drive prepare/mergePrepared directly, the way
  * StreamingPipeline does across a real micro-batch. */
class SnapshotStoreRaceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("append of a batch prepared under an old bucket count is refused") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_snap_race").toString
    val store = new SnapshotStore(s"$work/snap", nBuckets = 4)
    store.merge((0 until 40).map(k => (k.toLong, 1L, s"v$k")).toDF("k", "ts", "v"),
      Seq("k"), Seq("ts"))

    // the race: batch tagged under 4 buckets, reshard to 8 lands in between
    val stale = store.prepare(
      Seq((100L, 1L, "x")).toDF("k", "ts", "v"), Seq("k"))
    store.reshard(spark, 8)
    intercept[java.util.ConcurrentModificationException] {
      store.mergePrepared(stale, Seq("k"), Seq("ts"), Some(99L))
    }
    // nothing committed: no b99 segment, data unchanged
    assert(!store.liveSegments.contains("b99"))
    assert(store.read(spark).get.count() == 40)
    // the streaming engine's replay re-prepares under the new layout — and
    // that retry succeeds
    val retry = store.prepare(
      Seq((100L, 1L, "x")).toDF("k", "ts", "v"), Seq("k"))
    store.mergePrepared(retry, Seq("k"), Seq("ts"), Some(99L))
    assert(store.read(spark).get.count() == 41)
  }
}

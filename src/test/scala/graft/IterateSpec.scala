package graft

import graft.operators.{Iterate, Propagate, TextDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Durability contract of [[graft.operators.Iterate]]: every iterative
  * operator materializes per-round state through `Iterate.checkpoint`,
  * which uses reliable `checkpoint()` against the SparkContext checkpoint
  * dir when one is configured (cluster mode — survives executor loss) and
  * `localCheckpoint()` otherwise (single-host mode). The two modes must
  * produce IDENTICAL results; this spec runs the same loops both ways. */
class IterateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("iterate-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def withCheckpointDir[T](body: java.nio.file.Path => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("iterate_spec_ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try body(dir)
    finally {
      // Spark exposes no unset; clearing the internal option restores the
      // local-checkpoint fallback for the suites that run after this one.
      val f = spark.sparkContext.getClass.getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
    }
  }

  test("Iterate.checkpoint picks reliable mode iff a checkpoint dir is set") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    assert(Iterate.checkpoint(df).queryExecution.optimizedPlan.toString
      .contains("LogicalRDD")) // local checkpoint also lands as an RDD scan
    withCheckpointDir { dir =>
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      Iterate.checkpoint(df).queryExecution.toRdd.count()
      // reliable mode: checkpoint files exist under the configured dir
      assert(java.nio.file.Files.walk(dir).count() > 1,
        "reliable checkpoint wrote no files")
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("dedupClusters: identical labels in local and reliable modes") {
    val docs = (1L to 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 10L), (10L, 11L))
      .toDF("id1", "id2")
    def run(): Map[Long, Long] =
      TextDedup.dedupClusters(docs, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
    val local = run()
    val reliable = withCheckpointDir(_ => run())
    assert(local == reliable)
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L, 10L -> 9L, 11L -> 9L, 12L -> 12L))
  }

  test("pageRank: identical ranks in local and reliable modes") {
    val verts = (1L to 5L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("id1", "id2")
    def run(): Map[Long, Long] =
      Propagate.pageRank(verts, "id", pairs, iters = 4)
        .as[(Long, Long)].collect().toMap
    val local = run()
    val reliable = withCheckpointDir(_ => run())
    assert(local == reliable)
  }

  test("full curation chain under a real checkpoint dir: identical output, files land") {
    // The 100-TB durability claim exercised as a PIPELINE, not per
    // operator: near-dup pairs -> connected-component clusters ->
    // PageRank over the similarity graph, the chain q_curation_pipeline
    // composes, run once in local mode and once with a configured
    // checkpoint dir (the cluster deployment posture). Every iterative
    // round must route its materialization through the dir, and the
    // composed outputs must be bit-identical across modes.
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").localCheckpoint()
    def run(): (Map[Long, Long], Map[Long, Long]) = {
      val pairs = TextDedup.nearDuplicatePairs(docs, "doc_id", "text")
        .select("id1", "id2")
      val clusters = TextDedup.dedupClusters(docs, "doc_id", pairs)
      val pr = Propagate.pageRank(docs.select("doc_id"), "doc_id", pairs,
        iters = 3)
      (clusters.as[(Long, Long)].collect().toMap,
        pr.as[(Long, Long)].collect().toMap)
    }
    val (localClusters, localPr) = run()
    assert(localClusters.exists { case (id, c) => id != c },
      "fixture has no non-trivial cluster")
    val (reliable, ckptFiles) = withCheckpointDir { dir =>
      val r = run()
      (r, java.nio.file.Files.walk(dir).count())
    }
    assert(reliable._1 == localClusters,
      "cluster labels diverged between local and reliable checkpoint modes")
    assert(reliable._2 == localPr,
      "PageRank diverged between local and reliable checkpoint modes")
    assert(ckptFiles > 1, "no checkpoint files landed under the configured dir")
  }
}

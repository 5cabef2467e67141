package graft

import graft.operators.Rank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Truth tables for reciprocal-rank fusion: the closed-form integer
  * contribution, consensus-beats-single-list ordering, docs missing from
  * a list, tie-breaks, and the topK truncation. */
class RankSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("rank-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def fuse(a: Seq[(Long, Int)], b: Seq[(Long, Int)], topK: Int = 20) =
    Rank.rrfFuse(
        Seq(a.toDF("id", "rank"), b.toDF("id", "rank")), "id", "rank",
        k = 60, topK = topK)
      .select(col("rank"), col("id"), col("rrf_score"), col("n_lists"))
      .as[(Int, Long, Long, Int)].collect().toList

  test("closed-form contributions: scale div (k + rank), summed per doc") {
    // doc 7 is rank 1 in both lists: 2 * (1e9 div 61) = 32786884.
    // doc 8 is rank 2 in one list only: 1e9 div 62 = 16129032.
    val got = fuse(Seq((7L, 1), (8L, 2)), Seq((7L, 1)))
    assert(got == List((1, 7L, 2L * (1000000000L / 61), 2),
      (2, 8L, 1000000000L / 62, 1)))
  }

  test("consensus outranks a single strong list: mid-rank in both beats rank-1 in one") {
    // doc 1: rank 1 sparse only -> 1e9/61 = 16393442.
    // doc 2: rank 3 in both    -> 2*(1e9/63) = 31746030 > doc 1.
    val got = fuse(Seq((1L, 1), (2L, 3)), Seq((3L, 1), (2L, 3)))
    assert(got.head._2 == 2L && got.head._4 == 2)
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("equal fused scores break to the smaller id; topK truncates") {
    // docs 4 and 9 both rank 2 in one list each -> identical score.
    val got = fuse(Seq((4L, 2)), Seq((9L, 2)), topK = 1)
    assert(got == List((1, 4L, 1000000000L / 62, 1)))
  }
}

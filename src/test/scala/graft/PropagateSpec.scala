package graft

import graft.operators.{Propagate, TextDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Truth tables for score propagation over a similarity graph: the k-hop
  * bound (round k lifts scores from exactly the k-hop neighborhood, no
  * further), the diameter fixpoint (== per-connected-component max), and
  * keep-best canonical selection (argmax score, ties to the smaller id). */
class PropagateSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("propagate-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("id"), col("s")).as[(Long, Long)].collect().toMap

  test("maxPropagate: k-hop bound on a line graph 1-2-3-4") {
    // score 100 sits at vertex 1; vertex v is v-1 hops away, so it must
    // first read 100 after exactly v-1 rounds — earlier reads are a bug
    // (propagating past the k-hop neighborhood), later reads mean a
    // round was lost.
    val scores = Seq((1L, 100L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("id", "s")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    assert(scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 0)) ==
      Map(1L -> 100L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 1)) ==
      Map(1L -> 100L, 2L -> 100L, 3L -> 1L, 4L -> 1L))
    assert(scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 2)) ==
      Map(1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 1L))
    assert(scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 3)) ==
      Map(1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 100L))
  }

  test("maxPropagate: isolated vertices keep their score; iters past the diameter are stable") {
    val scores = Seq((1L, 10L), (2L, 50L), (3L, 20L), (4L, 5L), (5L, 99L),
      (6L, 7L)).toDF("id", "s")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val want = Map(1L -> 50L, 2L -> 50L, 3L -> 50L, 4L -> 99L, 5L -> 99L, 6L -> 7L)
    assert(scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 2)) == want)
    assert(scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 8)) == want)
  }

  test("maxPropagate at the diameter == per-connected-component max (vs dedupClusters)") {
    // 40 vertices, edges chain every pair (8k, 8k+1),(8k+1, 8k+2).. within
    // blocks of 8 — components are the blocks, diameter 7.
    val n = 40L
    val docs = (0L until n).map(i => (i, s"d$i")).toDF("id", "t")
    val pairs = (0L until n).filter(i => i % 8 != 7 && i + 1 < n)
      .map(i => (i, i + 1)).toDF("id1", "id2")
    val scores = (0L until n).map(i => (i, (i * 37 + 11) % 101)).toDF("id", "s")

    val got = scoresOf(Propagate.maxPropagate(scores, "id", "s", pairs, 7))
    val comp = TextDedup.dedupClusters(docs, "id", pairs)
      .select(col("id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    val base = scores.as[(Long, Long)].collect().toMap
    val compMax = base.groupBy { case (id, _) => comp(id) }
      .map { case (c, m) => c -> m.values.max }
    val want = base.keys.map(id => id -> compMax(comp(id))).toMap
    assert(got == want)
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("id"), col("pr")).as[(Long, Long)].collect().toMap

  test("pageRank: star center out-ranks leaves; leaves tie exactly") {
    val vs = (0L to 4L).map(Tuple1(_)).toDF("id")
    val pairs = (1L to 4L).map(l => (0L, l)).toDF("id1", "id2")
    val got = ranksOf(Propagate.pageRank(vs, "id", pairs, iters = 3))
    assert(got(0L) > got(1L))
    assert((1L to 4L).map(got).toSet.size == 1)
  }

  test("pageRank: closed-form first round on a 2-vertex pair + isolated vertex") {
    // scale=1000, N=4 -> init=250, base=(1500*250) div 10000 = 37.
    // pair {1,2}: deg 1 each, share 250 -> r' = 37 + 8500*250 div 10000 = 249.
    // isolated 3,4: r' = base = 37. Total mass only shrinks by floor loss.
    val vs = (1L to 4L).map(Tuple1(_)).toDF("id")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val got = ranksOf(Propagate.pageRank(vs, "id", pairs, iters = 1,
      dampBp = 8500, scale = 1000L))
    assert(got == Map(1L -> 249L, 2L -> 249L, 3L -> 37L, 4L -> 37L))
  }

  test("pageRank: iters=0 is the uniform init; mass never exceeds scale") {
    val vs = (1L to 7L).map(Tuple1(_)).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val r0 = ranksOf(Propagate.pageRank(vs, "id", pairs, iters = 0))
    assert(r0.values.toSet == Set(1000000000000L / 7))
    val r4 = ranksOf(Propagate.pageRank(vs, "id", pairs, iters = 4))
    assert(r4.values.sum <= 1000000000000L)
    assert(r4.values.forall(_ > 0))
  }

  test("personalizedPageRank: rank flows only from seeds; unreachable stays 0") {
    // seed 1 in component {1,2,3}; component {4,5} and isolated 6 unseeded.
    // scale=1000, |S|=1 -> init=1000, base=150.
    val vs = (1L to 6L).map(Tuple1(_)).toDF("id")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val got = Propagate.personalizedPageRank(vs, "id", seeds, pairs,
        iters = 2, dampBp = 8500, scale = 1000L)
      .select(col("id"), col("ppr")).as[(Long, Long)].collect().toMap
    assert(got(4L) == 0L && got(5L) == 0L && got(6L) == 0L)
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
    // round 1: r(1)=150 + .85*(1000 div 1... deg(1)=1, share to 2 only:
    // r(2) = 850*1000 div 10000... check closed-form round 1 by hand:
    // r0 = (1000, 0, 0); shares: 1->2: 1000 div 1 = 1000.
    // r1(1)=150+0=150, r1(2)=0+8500*1000 div 10000=850, r1(3)=0.
    // round 2: shares: 1: 150 div 1 -> inbox(2) += 150;
    // 2: 850 div 2 = 425 -> inbox(1) += 425, inbox(3) += 425.
    // r2(1)=150+(8500*425 div 10000)=150+361=511,
    // r2(2)=0+(8500*150 div 10000)=127, r2(3)=361.
    assert(got == Map(1L -> 511L, 2L -> 127L, 3L -> 361L,
      4L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("keepBest: argmax score per cluster, ties broken by the smaller id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 0L), (5L, 3L))
      .toDF("id", "q")
    val got = Propagate.keepBest(clusters, "id", "cluster_id", scores, "q")
      .select(col("cluster_id"), col("id"), col("q"))
      .as[(Long, Long, Long)].collect().toSet
    // cluster 1: docs 2 and 3 tie at q=9 -> doc 2 (smaller id) wins
    assert(got == Set((1L, 2L, 9L), (4L, 4L, 0L), (5L, 5L, 3L)))
  }
}

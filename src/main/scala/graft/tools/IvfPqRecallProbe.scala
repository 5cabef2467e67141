package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: recall@3 of annTopKIvfPq / annTopKPq vs the exact
  * integer-L2 brute force on the sf0.01 audit corpus. */
object IvfPqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val rows = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v * 1000).toLong).toArray))
    val qs = rows.filter(_._1 < 10)
    val exact = qs.flatMap { case (qid, qv) =>
      rows.filter(_._1 != qid)
        .map { case (nid, nv) =>
          (nid, qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (nid, d) => (d, nid) }.take(3)
        .map { case (nid, _) => (qid, nid) }
    }.toSet
    val q = e.filter(col("vec_id") < 10)
    val byId = rows.toMap
    def refined(pool: org.apache.spark.sql.DataFrame, label: String): Unit = {
      // driver-side refine: exact integer L2 rerank of the candidate pool
      val got = pool.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).toSeq.flatMap { case (qid, cands) =>
          val qv = byId(qid)
          cands.map(_._2).distinct
            .map { nid =>
              val nv = byId(nid)
              (nid, qv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum) }
            .sortBy { case (nid, d) => (d, nid) }.take(3)
            .map { case (nid, _) => (qid, nid) }
        }.toSet
      println(f"RECALL $label: ${got.intersect(exact).size.toDouble / exact.size}%.3f")
    }
    for ((label, pool) <- Seq(
      "pq30_refine3" -> graft.operators.Clustering.annTopKPq(e, q,
        "vec_id", "embedding", dim = 64, kNN = 30),
      "pq60_refine3" -> graft.operators.Clustering.annTopKPq(e, q,
        "vec_id", "embedding", dim = 64, kNN = 60),
      "ivfpq_p2_30_refine3" -> graft.operators.Clustering.annTopKIvfPq(e, q,
        "vec_id", "embedding", dim = 64, kNN = 30, nProbe = 2),
      "ivfpq_p4_30_refine3" -> graft.operators.Clustering.annTopKIvfPq(e, q,
        "vec_id", "embedding", dim = 64, kNN = 30, nProbe = 4)))
      refined(pool, label)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Iterate

/** Dev probe (r14, NEGATIVE result recorded): isolate the pageRank LOOP
  * cost, shipped shape (per-round share join against a separate degree
  * table) vs a degree-on-edges variant (degree attached to the edge list
  * once, one join per round instead of two), on synthetic graphs at two
  * scales — the bench-subset A/B is drowned by the shared near-dup memo
  * build each run pays. Measured: bit-identical ranks, but NO timing win
  * (5k vertices: ~tie at 2.2-2.8 s; 500k vertices: 10.3-12.9 s shipped vs
  * 7.5-16.5 s variant — inside run-to-run variance). AQE already
  * broadcasts the |V|-row share table, so removing that join only moves
  * the same bytes into the |E| join's payload. Variant rejected; shipped
  * shape retained. */
object PrLoopProbe {
  /** The REJECTED degree-on-edges variant (kept for the A/B record). */
  def pageRankDegOnEdges(vertices: DataFrame, idCol: String, pairs: DataFrame,
                         iters: Int, dampBp: Int = 8500,
                         scale: Long = 1000000000000L): DataFrame = {
    val edges = Iterate.checkpoint(
      pairs.select(col("id1").as("_a"), col("id2").as("_b"))
        .unionByName(pairs.select(col("id2").as("_a"), col("id1").as("_b"))))
    val n = vertices.select(col(idCol)).count()
    val init = scale / n
    val base = ((10000L - dampBp) * init) / 10000L
    val edgesDeg = Iterate.checkpoint(edges.join(
      edges.groupBy(col("_a")).agg(count(lit(1)).as("_d")), Seq("_a")))
    var cur = Iterate.checkpoint(
      vertices.select(col(idCol)).withColumn("_r", lit(init)))
    for (_ <- 1 to iters) {
      val inbox = edgesDeg
        .join(cur.select(col(idCol).as("_a"), col("_r")), Seq("_a"))
        .groupBy(col("_b").as(idCol))
        .agg(sum(expr("_r div _d")).as("_s"))
      cur = Iterate.checkpoint(cur.join(inbox, Seq(idCol), "left")
        .select(col(idCol),
          (lit(base) +
            expr(s"($dampBp * coalesce(_s, 0L)) div 10000")).as("_r")))
    }
    cur.withColumnRenamed("_r", "pr")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (nV <- Seq(5000L, 500000L)) {
      val nE = nV * 4
      val verts = spark.range(nV).select(col("id").as("doc_id")).localCheckpoint()
      val pairs = spark.range(nE).select(
        pmod(expr("xxhash64(id)"), lit(nV)).as("id1"),
        pmod(expr("xxhash64(id + 7)"), lit(nV)).as("id2")).localCheckpoint()
      for (rep <- 1 to 3) {
        var t0 = System.nanoTime()
        val a = pageRankDegOnEdges(verts, "doc_id", pairs, iters = 3)
          .agg(sum("pr")).first().getLong(0)
        val tOld = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val b = graft.operators.Propagate.pageRank(verts, "doc_id", pairs, iters = 3)
          .agg(sum("pr")).first().getLong(0)
        val tNew = (System.nanoTime() - t0) / 1e9
        println(f"PRLOOP nV=$nV rep=$rep variant=$tOld%.2f s shipped=$tNew%.2f s " +
          f"equal=${a == b} (sum $a vs $b)")
      }
    }
    spark.stop()
  }
}

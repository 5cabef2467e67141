package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DedupIndex, GenStore, TextDedup}

/** Dev tool: stage-timed replica of DedupIndex.matchBatch at sf0.1 —
  * prints per-stage wall seconds to locate the bandK=16 verify cost.
  * FROZEN SNAPSHOT of the measured plan (BASELINE.md round-10 third wave):
  * if DedupIndex's pruning scheme changes, re-derive before re-measuring. */
object IncrProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm: index built + caches hot
    graft.SparkEntry.queries("q_incr_dedup")(spark, dir)
      .queryExecution.toRdd.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val idxDir = s"/tmp/graft_cache/sf0.1/incr_dedup_index"
    val st = GenStore.readOrFail(idxDir, "DedupIndex")
    val idCol = "doc_id"

    val shI = timed("shI (batch shingles)") {
      val d = TextDedup.sortedShingleHashes(incoming, idCol, "text")
      d.count(); d
    }
    val bi = timed("bi (batch bands)") {
      val d = TextDedup.bandedFromShingles(shI, idCol, st.props("bandK"))
      d.count(); d
    }
    val beT = timed("beT (pruned stored bands)") {
      val nPfx = st.props("nPfx")
      val touched = bi.select(pmod(hash(col("bucket")), lit(nPfx)).as("pfx"))
        .distinct().collect().map(_.getInt(0))
      val d = GenStore.readTableCached(spark, idxDir, st, "bands")
        .filter(col("pfx").isin(touched.map(Integer.valueOf): _*))
        .select(col(idCol), col("band"), col("bucket"))
        .join(broadcast(bi.select("band", "bucket").distinct()),
          Seq("band", "bucket"), "left_semi")
        .localCheckpoint()
      d
    }
    val shE = timed("shE (pruned stored shingles)") {
      val nPfx = st.props("nPfx")
      val oldPfx = beT.select(pmod(hash(col(idCol)), lit(nPfx)).as("pfx"))
        .distinct().collect().map(_.getInt(0))
      GenStore.readTableCached(spark, idxDir, st, "shingles")
        .filter(col("pfx").isin(oldPfx.map(Integer.valueOf): _*))
        .select(col(idCol), col("sh"))
    }
    timed("counts+cand+verify (full)") {
      TextDedup.incrementalDedupPrepared(shE, beT, incoming, shI, bi, idCol,
        0.6, 4096, bePreFiltered = true).queryExecution.toRdd.count()
    }
    // decompose the verify: pairs without the best-match reduction
    timed("verified pairs only") {
      TextDedup.incrementalVerifiedPairs(shE, beT, shI, bi, idCol,
        0.6, 4096, bePreFiltered = true).queryExecution.toRdd.count()
    }
    // candidate volume
    val nCand = timed("candidate count") {
      val counts = bi.unionByName(beT).groupBy("band", "bucket").count()
      val ok = counts.filter(col("count") <= 4096).select("band", "bucket")
      bi.join(ok, Seq("band", "bucket"))
        .select(col(idCol).as("new_id"), col("band"), col("bucket"))
        .join(beT.join(ok, Seq("band", "bucket"))
          .select(col(idCol).as("old_id"), col("band"), col("bucket")),
          Seq("band", "bucket"))
        .select("new_id", "old_id").distinct().count()
    }
    println(s"candidates: $nCand")
    spark.stop()
  }
}

/** Kill-rate probe: of the distinct candidates, how many survive the
  * length-ratio filter; and the pre-distinct row volume. */
object IncrKillRate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q_incr_dedup")(spark, dir)
      .queryExecution.toRdd.count()
    val docs = graft.Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val idxDir = s"/tmp/graft_cache/sf0.1/incr_dedup_index"
    val st = GenStore.readOrFail(idxDir, "DedupIndex")
    val idCol = "doc_id"
    val shI = TextDedup.sortedShingleHashes(incoming, idCol, "text")
    val bi = TextDedup.bandedFromShingles(shI, idCol, st.props("bandK"))
    val nPfx = st.props("nPfx")
    val touched = bi.select(pmod(hash(col("bucket")), lit(nPfx)).as("pfx"))
      .distinct().collect().map(_.getInt(0))
    val beT = GenStore.readTableCached(spark, idxDir, st, "bands")
      .filter(col("pfx").isin(touched.map(Integer.valueOf): _*))
      .select(col(idCol), col("band"), col("bucket"))
      .join(broadcast(bi.select("band", "bucket").distinct()),
        Seq("band", "bucket"), "left_semi")
      .localCheckpoint()
    val oldPfx = beT.select(pmod(hash(col(idCol)), lit(nPfx)).as("pfx"))
      .distinct().collect().map(_.getInt(0))
    val shE = GenStore.readTableCached(spark, idxDir, st, "shingles")
      .filter(col("pfx").isin(oldPfx.map(Integer.valueOf): _*))
      .select(col(idCol), col("sh"))
    val counts = bi.unionByName(beT).groupBy("band", "bucket").count()
    val ok = counts.filter(col("count") <= 4096).select("band", "bucket")
    val raw = bi.join(ok, Seq("band", "bucket"))
      .select(col(idCol).as("new_id"), col("band"), col("bucket"))
      .join(beT.join(ok, Seq("band", "bucket"))
        .select(col(idCol).as("old_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("new_id", "old_id")
    println(s"pre-distinct rows: ${raw.count()}")
    val cand = raw.distinct()
    val lenI = shI.select(col(idCol).as("new_id"), size(col("sh")).as("len1"))
    val lenE = shE.select(col(idCol).as("old_id"), size(col("sh")).as("len2"))
    val survive = cand.join(broadcast(lenI), Seq("new_id"))
      .join(broadcast(lenE), Seq("old_id"))
      .filter(col("len1").cast("double") >= col("len2") * 0.6 &&
        col("len2").cast("double") >= col("len1") * 0.6)
    println(s"distinct candidates: ${cand.count()}; survive len: ${survive.count()}")
    spark.stop()
  }
}

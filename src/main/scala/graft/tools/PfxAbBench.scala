package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DedupIndex, TextDedup}

/** Measure-don't-guess A/B for the round-8 verify-side shingle pruning:
  * three assemblies of the stored-index match at sf0.1, timed median-of-3.
  *
  *   A current  — DedupIndex.matchBatch as shipped (lazy pruned beT; the
  *                candidate-pfx collect runs the pruned-bands semi-join
  *                once, the main plan re-runs the pruned scans).
  *   B ckpt     — beT localCheckpoint'ed before the pfx collect, so the
  *                pruned band slice materializes once and every consumer
  *                reads blocks (hides the scan from the plan — the reason
  *                A shipped instead; see IncrIndexSpec).
  *   C superset — candidate-pfx collect WITHOUT the batch semi-join (all
  *                ids in touched bands partitions): cheaper collect job,
  *                weaker shingle pruning.
  */
object PfxAbBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = s"/tmp/graft_cache/${new java.io.File(sf).getName}/pfx_ab_index"
    if (!DedupIndex.exists(dir))
      DedupIndex.build(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", dir)
    val batch = docs.filter(col("doc_id") % 5 === 0).localCheckpoint()
    val nPfx = DedupIndex.numPfx(dir)

    def assemble(variant: String): DataFrame = {
      if (variant == "A") return DedupIndex.matchBatch(batch, "doc_id", "text", dir)
      val shI = TextDedup.sortedShingleHashes(batch, "doc_id", "text")
      val bi = TextDedup.bandedFromShingles(shI, "doc_id")
      val touched = bi.select(pmod(hash(col("bucket")), lit(nPfx)).as("pfx"))
        .distinct().collect().map(_.getInt(0))
      val pruned = DedupIndex.bands(spark, dir)
        .filter(col("pfx").isin(touched.map(Integer.valueOf): _*))
        .select(col("doc_id"), col("band"), col("bucket"))
      val beT0 = pruned.join(
        broadcast(bi.select("band", "bucket").distinct()),
        Seq("band", "bucket"), "left_semi")
      val (beT, pfxSrc) =
        if (variant == "B") { val c = beT0.localCheckpoint(); (c, c) }
        else (beT0, pruned) // C: superset — all ids in touched partitions
      val oldPfx = pfxSrc.select(pmod(hash(col("doc_id")), lit(nPfx)).as("pfx"))
        .distinct().collect().map(_.getInt(0))
      val shE = DedupIndex.shingles(spark, dir)
        .filter(col("pfx").isin(oldPfx.map(Integer.valueOf): _*))
        .select(col("doc_id"), col("sh"))
      TextDedup.incrementalDedupPrepared(shE, beT, batch, shI, bi, "doc_id")
    }

    for (v <- Seq("A", "B", "C")) {
      assemble(v).queryExecution.toRdd.count() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        assemble(v).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PFXAB variant=$v median=${ts(1)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: timing + realized rounds of 256-merge batched BPE, on the
  * template `documents` corpus AND the heavy-tailed ZipfCorpus fixture
  * (VERDICT r10 #2 — the production regime the batched scheduler targets). */
object BpeProdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01");
         n <- Seq(8, 16, 32, 48, 64, 89, 256)) {
      val docs = graft.Tables.documents(spark, dir)
      val t0 = System.nanoTime()
      val rounds = graft.operators.Bpe.roundsUsed(docs, "text", n, 8)
      val got = graft.operators.Bpe.trainBatched(docs, "text", n, 8).count()
      println(f"BPEPROD dir=$dir n=$n merges=$got rounds=$rounds " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    for (n <- Seq(64, 128, 256, 512); mb <- Seq(8, 16)) {
      val docs = ZipfCorpus.docs(spark).localCheckpoint()
      val t0 = System.nanoTime()
      val rounds = graft.operators.Bpe.roundsUsed(docs, "text", n, mb)
      val got = graft.operators.Bpe.trainBatched(docs, "text", n, mb).count()
      println(f"BPEPROD dir=zipf(30k,s=1.07) n=$n maxBatch=$mb merges=$got " +
        f"rounds=$rounds ratio=${rounds.toDouble / got}%.2f " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}

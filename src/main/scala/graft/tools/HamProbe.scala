package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: pair counts of the simhash Hamming join at several radii —
  * picks q_simhash_neardup's maxHamming so the result is non-vacuous. */
object HamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      val sig = graft.operators.TextDedup
        .simHashSignature(docs, "doc_id", "text").localCheckpoint()
      val nd = sig.select("simhash").distinct().count()
      for (k <- Seq(3, 8, 12, 16, 20)) {
        val n = graft.operators.TextDedup
          .hammingNearDupPairs(sig, "doc_id", "simhash", k).count()
        println(s"HAM sf=$sf distinctSigs=$nd k=$k pairs=$n")
      }
    }
    spark.stop()
  }
}

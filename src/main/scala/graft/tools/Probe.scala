package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextDedup

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count() // warmup
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("minhash md5 (oracle parity)")(
      TextDedup.minHashSignature(docs, "doc_id", "text").count())
    time("minhash xxhash64 (production)")(
      TextDedup.minHashSignature(docs, "doc_id", "text", oracleParity = false).count())
    time("winnow md5")(
      TextDedup.winnowingFingerprints(docs, "doc_id", "text").count())
    time("winnow xxhash64")(
      TextDedup.winnowingFingerprints(docs, "doc_id", "text", oracleParity = false).count())
    spark.stop()
  }
}

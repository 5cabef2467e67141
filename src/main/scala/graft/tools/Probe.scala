package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextDedup

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s => $r"); r
    }
    val docs = Tables.documents(spark, dir)
    time("warmup")(docs.count())
    val sig = TextDedup.minHashSignature(docs, "doc_id", "text")
    time("sig.count")(sig.count())
    val bands = sig.select(col("doc_id"), posexplode(array(
      concat_ws("_", col("mh0"), col("mh1")),
      concat_ws("_", col("mh2"), col("mh3")),
      concat_ws("_", col("mh4"), col("mh5")),
      concat_ws("_", col("mh6"), col("mh7")))).as(Seq("band", "bucket")))
    val cp = time("checkpoint")(bands.localCheckpoint())
    val a = cp.select(col("doc_id").as("id1"), col("band"), col("bucket"))
    val b = cp.select(col("doc_id").as("id2"), col("band"), col("bucket"))
    val joined = a.join(b, Seq("band", "bucket")).filter(col("id1") < col("id2"))
    time("join.count")(joined.count())
    time("distinct.count")(joined.select("id1", "id2").distinct().count())
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: output sizes of fingerprintOverlapPairs at candidate knobs —
  * picks q_winnow_overlap's minShared so the result is non-vacuous. */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      for (ms <- Seq(1, 2, 4)) {
        val p = graft.operators.TextDedup
          .fingerprintOverlapPairs(docs, "doc_id", "text", minShared = ms)
          .localCheckpoint()
        val n = p.count()
        val hi = p.filter(col("containment") >= 0.5).count()
        println(s"OVL sf=$sf minShared=$ms pairs=$n highContain=$hi")
      }
    }
    spark.stop()
  }
}

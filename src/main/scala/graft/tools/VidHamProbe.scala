package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: pair counts of the frame-0 video-dHash Hamming join. */
object VidHamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sf).select("doc_id")
    val withAvi = graft.multimodal.Multimodal.withSyntheticAvi(docs, "doc_id")
    val f0 = graft.multimodal.Multimodal.videoFrameDHash(withAvi, "avi", "doc_id")
      .filter(col("frame_index") === 0).select(col("doc_id"), col("dhash"))
      .localCheckpoint()
    println("VID distinct=" + f0.select("dhash").distinct().count())
    for (k <- Seq(1, 2, 4, 8)) {
      val n = graft.operators.TextDedup
        .hammingNearDupPairs(f0, "doc_id", "dhash", k, bits = 56).count()
      println(s"VID k=$k pairs=$n")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object DbgPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val aTxt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bTxt = "north south east west upper lower inner outer front back"
    val sTxt = "solitary unique standalone document nothing matches this one"
    val seed = Seq((10L, aTxt), (11L, aTxt), (20L, bTxt), (21L, bTxt), (30L, sTxt))
      .toDF("doc_id", "text")
    val batch = Seq((40L, s"$aTxt $bTxt"),
      (41L, sTxt.replaceFirst("^\\S+", "isolated"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dbg_didx").toString
    graft.operators.DedupIndex.build(seed, "doc_id", "text", dir)
    println("== thr 0.4")
    graft.operators.DedupIndex.matchBatchPairs(batch, "doc_id", "text", dir, 0.4)
      .show(20, false)
    println("== thr 0.25")
    graft.operators.DedupIndex.matchBatchPairs(batch, "doc_id", "text", dir, 0.25)
      .show(20, false)
  }
}

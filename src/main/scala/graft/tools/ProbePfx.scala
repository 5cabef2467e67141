package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure-don't-guess probe for DedupIndex's file-level pruning: per
  * single-doc batch, the planned file counts of the stored bands and
  * shingles scans (vs the store's totals) and whether the match still
  * finds the doc's twin. Round-8 finding recorded here: on the synthetic
  * corpus every doc collides with the giant duplicate family's band
  * bucket, so candidate-id pruning of the verify-side shingles scan only
  * bites for docs with small candidate sets (the streaming-gate shape) —
  * which is the contract: the pruned scan tracks CANDIDATES, and when the
  * candidates span the corpus the read is the verification input itself,
  * not waste. IncrIndexSpec pins both regimes. */
object ProbePfx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id","text")
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("probe_didx").toString
    graft.operators.DedupIndex.build(existing, "doc_id", "text", dir, nPfx = 16)
    for (id <- Seq(0L, 5L, 7L, 10L, 15L, 20L, 25L, 35L, 40L, 55L, 65L, 85L)) {
      val batch = docs.filter(col("doc_id") === id)
      if (batch.count() > 0) {
        val out = graft.operators.DedupIndex.matchBatch(batch, "doc_id", "text", dir)
        val scans = out.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => 
            (f.relation.location.rootPaths.head.toString, f.selectedPartitions.totalNumberOfFiles)
        }
        val sh = scans.filter(_._1.contains("shingles")).map(_._2).sorted
        val bd = scans.filter(_._1.contains("bands")).map(_._2).sorted
        val dup = out.filter(col("is_dup")).count()
        println(s"PROBE id=$id shingleScans=${sh.mkString(",")} bandScans=${bd.mkString(",")} dup=$dup")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Index-maintenance entry point: compact a [[graft.operators.DedupIndex]]
  * store in place (reverse append-only small-file decay; see
  * `DedupIndex.compact` for the crash discipline). The job a deployment
  * schedules after every N ingest batches.
  *
  * Usage: `runMain graft.tools.IndexMaintain <indexDir> [shingleFiles]` */
object IndexMaintain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IndexMaintain <indexDir> [shingleFiles]")
    val dir = args(0)
    val shingleFiles = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.DedupIndex.compact(spark, dir, shingleFiles)
    println(s"COMPACTED $dir nPfx=${graft.operators.DedupIndex.numPfx(dir)}")
    spark.stop()
  }
}

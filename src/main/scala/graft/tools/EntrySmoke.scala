package graft.tools

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's flagship smoke: SparkEntry.entry(spark).count() > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY ROWS: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}

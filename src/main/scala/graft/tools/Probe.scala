package graft.tools

import org.apache.spark.sql.SparkSession
import graft.compile.ColumnSpecCompiler

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY ROWS=" + df.count())
    df.show(3, false)

    // row-per-table mode drive
    val header = Seq("schema", "table", "owner", "desc")
    val rows = Seq(Seq("public", "t1", "bob", "first"), Seq("", "t2", "", ""))
    println("detect=" + ColumnSpecCompiler.detectFormat(header))
    ColumnSpecCompiler.rowPerTableDdl(header, rows, "pre_")
      .foreach { case (n, ddl) => println(s"-- $n\n$ddl") }
    spark.stop()
  }
}

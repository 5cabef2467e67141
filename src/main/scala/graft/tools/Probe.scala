package graft.tools

import org.apache.spark.sql.SparkSession
import graft.compile.{DemoSpecs, PipelineCompiler}
import graft.spec.{SttmParser, SttmSpec}

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("events")
    // matrix names a delete-flag column the view doesn't have
    val spec = SttmSpec(
      DemoSpecs.deleteFlagPipeline.rows,
      SttmParser.matrixFromCsv(
        "Key,EVENTS_ALL_VW,XREF_USER_DF\n" +
          "changelog.mode,,upsert\n" +
          "\"graft.upsert.order\",,\"TS,EVENT_ID\"\n" +
          "graft.delete.flag,,NO_SUCH_COLUMN\n"))
    try {
      val out = PipelineCompiler.compile(spec, DemoSpecs.jsonOptions).run(spark)
      out("XREF_USER_DF").count()
      println("UNEXPECTED SUCCESS")
    } catch {
      case e: Exception => println("FAILURE MODE: " + e.getMessage.take(200))
    }
    spark.stop()
  }
}

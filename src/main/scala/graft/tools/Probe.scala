package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val (proj, opts) = graft.sources.KafkaWiring.writePlan(
      df, "SASL_SSL://broker:9092", "out-topic", Some("id"))
    println("SINK OPTS=" + opts)
    proj.show(false)
    try {
      graft.sources.KafkaWiring.readPayloadStream(spark,
        graft.sources.KafkaWiring.sourceOptions("SASL_SSL://broker:9092", Some("t"), None))
    } catch {
      case e: Exception => println("KAFKA READ FAILURE MODE: " + e.getMessage.take(200))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("payload",
        when(col("event_id") % 10 === 0, lit("{not-json"))
          .when(col("event_id") % 17 === 0, lit(null).cast("string")) // null payload
          .otherwise(col("props")))
    val s = graft.operators.DeadLetter.split(ev, "payload", StructType.fromDDL("k INT"))
    val total = ev.count(); val good = s.good.count(); val dead = s.dead.count()
    println(s"TOTAL=$total GOOD=$good DEAD=$dead SUM=${good + dead}")
    println("good has k column: " + s.good.columns.contains("k"))
    s.dead.select("event_id", "payload", "error_reason").show(3, false)
    spark.stop()
  }
}

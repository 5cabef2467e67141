package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.flatten.JsonFlattener

/** Dev scratch probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val schema = StructType.fromDDL(
      "org STRING, items ARRAY<STRUCT<sku: STRING, qty: INT>>")
    // malformed / mismatched / empty docs
    val docs = Seq(
      """{"org": "ok", "items": [{"sku": "a", "qty": 1}]}""",
      """not json at all""",
      """{"totally": "different"}""",
      """{"org": "noitems"}""",
      "").toDF("doc")
    val t = JsonFlattener.flatten(docs, "doc", schema)("items")
    println("ROWS=" + t.count())
    t.show(false)
  }
}

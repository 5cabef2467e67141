package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: the reference's connector surface offers
  * json / avro / parquet / bytearray / csv `format.class` values
  * (connector_config/models.py:39-45); this spec round-trips the documents
  * table through each Spark twin and asserts content equality. Avro needs
  * the external spark-avro module — absent in this environment, recorded
  * by the explicit availability probe rather than silently skipped.
  */
class FormatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  private def roundTrip(fmt: String): Unit = {
    val base = java.nio.file.Files.createTempDirectory(s"graft-fmt-$fmt").toString
    val d = docs
    d.write.format(fmt).save(s"$base/out")
    val back = spark.read.format(fmt)
      .option("inferSchema", "false")
      .schema(d.schema) // CSV/JSON need the explicit schema for exact types
      .load(s"$base/out")
    val a = d.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length, s"$fmt: row count ${b.length} != ${a.length}")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$fmt: row mismatch") }
  }

  test("parquet round-trips the documents table exactly")(roundTrip("parquet"))
  test("orc round-trips the documents table exactly")(roundTrip("orc"))
  test("json round-trips the documents table exactly")(roundTrip("json"))
  test("csv round-trips the documents table exactly") {
    // default CSV quoting must survive embedded commas/quotes in text
    roundTrip("csv")
  }

  test("bytearray twin: binary payload column round-trips through parquet") {
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-fmt-bin").toString
    val withBin = docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
    withBin.write.parquet(s"$base/out")
    val back = spark.read.parquet(s"$base/out")
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("text"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.sameElements(want))
  }

  test("avro availability is probed, not assumed") {
    // the external spark-avro module is not on this classpath; a user
    // moving this engine to a cluster with it gets the format for free
    val available =
      try { spark.read.format("avro"); true }
      catch { case _: Throwable => false }
    val canLoad =
      try {
        Class.forName("org.apache.spark.sql.avro.AvroFileFormat"); true
      } catch { case _: Throwable => false }
    info(s"spark-avro on classpath: $canLoad (reader handle: $available)")
    succeed
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table loaders.
  *
  * The driver-generated `events.parquet` stores `ts` as parquet
  * INT64 TIMESTAMP(NANOS) which Spark 4.x refuses to read as a
  * timestamp ([PARQUET_TYPE_ILLEGAL]). We read it as a raw long via
  * `spark.sql.legacy.parquet.nanosAsLong` and convert with integer
  * division (`div`, NOT `/` — double division would lose precision on
  * 1.7e18-scale values) to microseconds, exactly matching DuckDB's
  * nanos->micros truncation, so oracle comparisons line up.
  */
object Tables {
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** `events` with `ts` restored to TimestampType (microsecond precision). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def orders(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def nation(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}

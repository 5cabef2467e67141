package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table loaders.
  *
  * Earlier driver generations stored `events.ts` as parquet INT64
  * TIMESTAMP(NANOS), which Spark 4.x refuses to read as a timestamp
  * ([PARQUET_TYPE_ILLEGAL]); current generations store TIMESTAMP(MICROS,
  * ntz) which reads natively as TIMESTAMP_NTZ. We enable
  * `spark.sql.legacy.parquet.nanosAsLong` so the nanos form surfaces as
  * a raw long, then dispatch on the read schema: a LONG `ts` is converted
  * with integer division (`div`, NOT `/` — double division would lose
  * precision on 1.7e18-scale values) to microseconds, exactly matching
  * DuckDB's nanos->micros truncation; a TIMESTAMP_NTZ `ts` is converted
  * by taking its microsecond offset from the NTZ epoch (`timestampdiff`
  * over two NTZ operands is pure wall-clock arithmetic) and re-tagging
  * those micros as a UTC instant via `timestamp_micros`. That pipeline
  * never consults spark.sql.session.timeZone — a plain
  * `cast(ts as timestamp)` would, silently shifting every instant in a
  * session that didn't pin UTC (ADVICE r6). Either way the surfaced
  * column is microsecond-precision TimestampType holding the same
  * wall-clock micros DuckDB's naive timestamp arithmetic sees.
  */
object Tables {
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** `events` with `ts` restored to TimestampType (microsecond precision). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"))
      case _ => df
    }
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

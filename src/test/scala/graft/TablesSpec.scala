package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver has shipped `events.parquet` with two different `ts`
  * encodings across testdata generations: INT64 TIMESTAMP(NANOS)
  * (surfaced as a raw long under `nanosAsLong`) and TIMESTAMP(MICROS,
  * ntz) (surfaced as TIMESTAMP_NTZ). [[Tables.events]] must normalize
  * BOTH to the same microsecond TimestampType column, or every
  * `unix_micros`/window expression over events breaks on a data
  * regeneration (this took down six suites once — keep this pinned). */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("tables-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("events loader normalizes long-nanos and timestamp-ntz ts identically") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("tables_spec").toString
    val micros = Seq(1704067200000000L, 1704067207179575L, 1704070800123456L)

    // generation A: ts is a raw INT64 nanos column (what nanosAsLong surfaces)
    val dirA = s"$work/genA"
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L, i.toLong, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dirA/events.parquet")

    // generation B: ts is TIMESTAMP_NTZ carrying the same wall-clock micros
    val dirB = s"$work/genB"
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "view", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.parquet(s"$dirB/events.parquet")

    val a = Tables.events(spark, dirA)
    val b = Tables.events(spark, dirB)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)

    def loaded(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)

    val expect = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(loaded(a) == expect)
    assert(loaded(b) == expect)
  }

  test("ntz conversion is independent of spark.sql.session.timeZone") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("tables_spec_tz").toString
    val micros = Seq(1704067200000000L, 1704067207179575L)
    // Write the NTZ fixture under the suite's pinned UTC session.
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "view", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.parquet(s"$work/events.parquet")
    // Load under a DIFFERENT session timezone: the surfaced instants must
    // not shift (a plain NTZ->timestamp cast would move them by the UTC
    // offset — the latent bug ADVICE r6 flagged).
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val got = Tables.events(spark, work)
        .select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == micros.zipWithIndex.map { case (us, i) => (i.toLong, us) })
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka wiring for the S1 source shape: a single topic carrying many
  * logical tables, value = the raw payload column the STTM views parse
  * (final-output.sql:9; `raw_payload_col='val'`, sttm_to_flink_v22.py:306).
  *
  * Builds the `readStream.format("kafka")` / `writeStream.format("kafka")`
  * plans from connector config. This test environment has neither the
  * spark-sql-kafka connector jar nor a broker (readPayloadStream fails with
  * "Failed to find data source: kafka" here — observed), so option
  * construction and the sink projection are unit-tested and the batch twin
  * (a parquet `events` table with a payload column) drives the
  * oracle-checked queries; the streaming DataFrame shape is identical from
  * the payload column on. On a real cluster, add spark-sql-kafka-0-10 to
  * the session and these plans run unchanged.
  */
object KafkaWiring {

  /** Kafka source options from a connector Common + topic selection. */
  def sourceOptions(endpoint: String, topics: Option[String],
                    topicPattern: Option[String],
                    startingOffsets: String = "earliest"): Map[String, String] = {
    val broker = endpoint.replaceFirst("^.*://", "")
    Map("kafka.bootstrap.servers" -> broker,
      "startingOffsets" -> startingOffsets) ++
      topics.map("subscribe" -> _) ++
      topicPattern.map("subscribePattern" -> _)
  }

  /** Streaming read: raw Kafka records projected to the reference's payload
    * shape — one string column named `payloadCol` plus stream metadata. */
  def readPayloadStream(spark: SparkSession, opts: Map[String, String],
                        payloadCol: String = "val"): DataFrame =
    spark.readStream.format("kafka").options(opts).load()
      .select(
        col("value").cast("string").as(payloadCol),
        col("topic"), col("partition"), col("offset"),
        col("timestamp").as("kafka_ts"))

  /** Sink options + projection: rows serialized to the Kafka value column.
    * Keyed by `keyCol` when provided (partitioning by entity key preserves
    * per-key ordering — required for upsert-changelog consumers). */
  def writePlan(df: DataFrame, endpoint: String, topic: String,
                keyCol: Option[String]): (DataFrame, Map[String, String]) = {
    val broker = endpoint.replaceFirst("^.*://", "")
    val projected = keyCol match {
      case Some(k) =>
        df.select(col(k).cast("string").as("key"),
          to_json(struct(df.columns.map(col): _*)).as("value"))
      case None =>
        df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    }
    (projected, Map("kafka.bootstrap.servers" -> broker, "topic" -> topic))
  }
}

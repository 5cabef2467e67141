package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dead-letter handling (S5/T6): the reference's connector-level
  * `errors.tolerance=all` + DLQ topic (gcs_config_generator.py:149-151,
  * connector_config/models.py:13-15) re-expressed as a parse-with-side-output
  * operator: records whose payload fails schema parse are routed to a
  * quarantine DataFrame with an error tag instead of failing the job
  * (errors.tolerance=none maps to simply not calling [[split]] and letting
  * ANSI mode abort).
  */
object DeadLetter {

  final case class Split(good: DataFrame, dead: DataFrame)

  /** Parse `payloadCol` as JSON with `schema`; rows whose payload fails
    * DESERIALIZATION go to `dead` with the raw payload and a reason column.
    * Detection uses PERMISSIVE-mode's corrupt-record column, so well-formed
    * JSON that merely lacks the schema's fields (or carries explicit nulls)
    * stays in `good` with null fields — matching Kafka Connect's
    * errors.tolerance semantics (only deserialization failures dead-letter).
    */
  def split(df: DataFrame, payloadCol: String, schema: StructType): Split = {
    val corruptCol = "_graft_corrupt"
    val parseSchema = schema.add(corruptCol, "string")
    val parsed = df.withColumn("__p",
      from_json(col(payloadCol), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)))
    val isDead = col(s"__p.$corruptCol").isNotNull
    val good = parsed.filter(!isDead)
      .select(col("*"), col("__p.*"))
      .drop("__p", corruptCol)
    val dead = parsed.filter(isDead).drop("__p")
      .withColumn("error_reason", lit("MALFORMED_PAYLOAD"))
    Split(good, dead)
  }

  /** S4: mask named fields pre-sink (the MaskField SMT,
    * gcs_config_generator.py:140-141,162-172) — projection rewrite. */
  def maskFields(df: DataFrame, fields: Seq[String], mask: String = "***"): DataFrame =
    fields.foldLeft(df) { (acc, f) =>
      if (acc.columns.contains(f)) acc.withColumn(f, lit(mask)) else acc
    }
}

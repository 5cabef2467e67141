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

  /** Parse `payloadCol` as JSON with `schema`; rows where the payload is
    * non-null but unparseable (all-null struct) go to `dead` with the raw
    * payload and a reason column. */
  def split(df: DataFrame, payloadCol: String, schema: StructType): Split = {
    val parsed = df.withColumn("__p", from_json(col(payloadCol), schema))
    // from_json yields a struct of nulls for malformed input; a record is
    // dead iff the payload is non-null but every parsed field is null
    val allNull = schema.fields.map(f => col(s"__p.${f.name}").isNull)
      .reduce(_ && _)
    val isDead = col(payloadCol).isNotNull && allNull
    val good = parsed.filter(!isDead).select(col("*"), col("__p.*")).drop("__p")
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

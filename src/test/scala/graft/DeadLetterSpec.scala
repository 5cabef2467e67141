package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DeadLetter

/** Dead-letter classification must match errors.tolerance semantics: only
  * DESERIALIZATION failures dead-letter; well-formed JSON missing the
  * schema's fields (or carrying explicit nulls) stays good. */
class DeadLetterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("only malformed payloads dead-letter; missing/null fields stay good") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 5}"""),        // valid
      (2L, """{"k": null}"""),     // explicit null -> good
      (3L, """{"other": 1}"""),    // missing field -> good
      (4L, """{broken"""),         // malformed -> dead
      (5L, null.asInstanceOf[String]), // null payload -> good (null fields)
      (6L, """not json""")         // malformed -> dead
    ).toDF("id", "payload")
    val s = DeadLetter.split(df, "payload", StructType.fromDDL("k INT"))
    val deadIds = s.dead.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(deadIds == Seq(4L, 6L))
    val good = s.good.orderBy("id").collect()
    assert(good.length == 4)
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(good(0).getAs[Int]("k") == 5)
    assert(good(1).isNullAt(good(1).fieldIndex("k")))
    assert(s.dead.columns.contains("error_reason"))
    // partition invariant
    assert(s.good.count() + s.dead.count() == df.count())
  }
}

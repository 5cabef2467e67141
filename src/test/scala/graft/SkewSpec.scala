package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted-join skew mitigation: exact result parity with the plain join,
  * and the hot key's rows actually spread across salt partitions. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("saltedJoin == plain inner join on a skewed key distribution") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 10k probe rows, 95% on the hot key 1; build has multiple rows per key
    val probe = (1L to 10000L)
      .map(i => (if (i % 20 != 0) 1L else i % 7, i))
      .toDF("k", "probe_val")
    val build = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (5L, "e"))
      .toDF("k", "build_val")

    val plain = probe.join(build, Seq("k"))
      .select("k", "probe_val", "build_val")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(probe, build, "k", nSalt = 8)
      .select("k", "probe_val", "build_val")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("salting spreads the hot key over the salt space") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val probe = (1L to 8000L).map(i => (1L, i)).toDF("k", "probe_val") // all hot
    val salted = probe.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
    val sizes = salted.groupBy("_salt").count().collect().map(_.getLong(1))
    // every salt bucket occupied, and no bucket holds more than 2x the mean
    assert(sizes.length == 8)
    val mean = sizes.sum / sizes.length
    assert(sizes.max <= 2 * mean,
      s"salt distribution skewed: ${sizes.mkString(",")}")
  }

  test("fully duplicate probe rows still spread (content-independent salt)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // every probe row IDENTICAL (hot key + same payload) — a content-hash
    // salt would put all 8000 on one salt value and not spread at all
    val probe = (1L to 8000L).map(_ => (1L, 42L)).toDF("k", "probe_val")
    val salted = probe.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
    val sizes = salted.groupBy("_salt").count().collect().map(_.getLong(1))
    assert(sizes.length == 8)
    val mean = sizes.sum / sizes.length
    assert(sizes.max <= 2 * mean,
      s"duplicate rows collapsed onto few salts: ${sizes.mkString(",")}")
  }

  test("saltedJoin == plain LEFT join, unmatched probe rows null exactly once") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 95% of probe rows on hot key 1; keys 0 and 4,6 have NO build match —
    // the quarantine/enrichment shape (J4/J5) where production skew bites
    val probe = (1L to 10000L)
      .map(i => (if (i % 20 != 0) 1L else i % 7, i))
      .toDF("k", "probe_val")
    val build = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (5L, "e"))
      .toDF("k", "build_val")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "probe_val", "build_val")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .sortBy(t => (t._1, t._2, t._3))
    val plain = canon(probe.join(build, Seq("k"), "left"))
    val salted = canon(Skew.saltedJoin(probe, build, "k", nSalt = 8,
      joinType = "left"))
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("partitionHistogram surfaces the hot key") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = ((1L to 900L).map(_ => 7L) ++ (1L to 100L)).map((_, 1)).toDF("k", "v")
    val top = Skew.partitionHistogram(df, "k", 16).collect()(0).getLong(1)
    assert(top >= 900L) // the partition holding key 7 dominates
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketch

class SketchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def occurrences = {
    import spark.implicits._
    // skewed stream: key_i appears i^2 times, 20 keys, 2870 occurrences
    (1 to 20).flatMap(i => Seq.fill(i * i)(s"key$i")).toDF("k")
  }

  test("countMin: never underestimates; exact when the table outsizes the key set") {
    spark.sparkContext.setLogLevel("ERROR")
    val occ = occurrences
    val exact = occ.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // cramped table (collisions certain): estimates dominate exact counts
    val skSmall = Sketch.countMinBuild(occ, "k", d = 3, w = 8)
    val estSmall = Sketch.countMinEstimate(skSmall, occ, "k", d = 3, w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estSmall.forall { case (k, e) => e >= exact(k) },
      "count-min must never underestimate")
    assert(estSmall.exists { case (k, e) => e > exact(k) },
      "w=8 over 20 keys should show collision overestimates")
    // roomy table: every estimate lands exactly
    val skBig = Sketch.countMinBuild(occ, "k", d = 4, w = 4096)
    val estBig = Sketch.countMinEstimate(skBig, occ, "k", d = 4, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estBig == exact, s"w=4096 should be collision-free: $estBig vs $exact")
  }

  test("countMin xxhash64 production path: same guarantees, deterministic") {
    spark.sparkContext.setLogLevel("ERROR")
    val occ = occurrences
    val exact = occ.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = Sketch.countMinBuild(occ, "k", d = 3, w = 8, oracleParity = false)
    val est = Sketch.countMinEstimate(sk, occ, "k", d = 3, w = 8,
        oracleParity = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.forall { case (k, e) => e >= exact(k) })
    val again = Sketch.countMinEstimate(sk, occ, "k", d = 3, w = 8,
        oracleParity = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est)
  }

  test("countMin: sketches merge by cell-wise addition (shard roll-up contract)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val occ = occurrences.withColumn("half", pmod(xxhash64(col("k")), lit(2)))
    val merged = Sketch.countMinBuild(occ.filter(col("half") === 0), "k", 3, 8)
      .unionByName(Sketch.countMinBuild(occ.filter(col("half") === 1), "k", 3, 8))
      .groupBy("r", "b").agg(sum("c").as("c"))
    val whole = Sketch.countMinBuild(occ, "k", 3, 8)
    assert(merged.orderBy("r", "b").collect().toSeq ==
      whole.orderBy("r", "b").collect().toSeq,
      "merged shard sketches must equal the whole-stream sketch")
    // sketch size is d*w regardless of input volume
    assert(whole.count() <= 3 * 8)
  }
}

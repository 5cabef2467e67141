package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("temperature mix upweights low-resource sources vs proportional share") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // source A: 100 docs x 100 tokens = 10,000; source B: 4 docs x 25 = 100
    val docs = ((1 to 100).map(i => (i.toLong, "A", Seq.fill(100)("w").mkString(" "))) ++
      (1 to 4).map(i => (100L + i, "B", Seq.fill(25)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val plan = Sampling.temperatureMixPlan(docs, "source", "text",
        budgetTokens = 1000L)
      .orderBy("source").collect()
    val a = plan(0); val b = plan(1)
    // weight = floor(sqrt(avail_tok)): 100 and 10
    assert(a.getAs[Long]("weight") == 100L && b.getAs[Long]("weight") == 10L)
    // B's temperature share is 10/110 ~ 9% of budget vs ~1% proportional
    assert(b.getAs[Long]("target_tok") == 1000L * 10 / 110)
    assert(a.getAs[Long]("target_tok") == 1000L * 100 / 110)
    // sample_bp basis points derive from plan_tok/avail_tok exactly
    assert(b.getAs[Long]("sample_bp") ==
      b.getAs[Long]("plan_tok") * 10000 / b.getAs[Long]("avail_tok"))
  }

  test("quantileCalibrate: within-group percentiles, ties share, 1-row group is 0") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // A: scores 10,20,20,30 over n=4 -> below-counts 0,1,1,3 ->
    //    pct (0,3333,3333,10000); B: single row -> 0
    val docs = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 20L),
      (4L, "A", 30L), (5L, "B", 7L)).toDF("doc_id", "source", "score")
    val out = graft.operators.Sampling
      .quantileCalibrate(docs, "source", col("score"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pct_bp")).toMap
    assert(out == Map(1L -> 0L, 2L -> 3333L, 3L -> 3333L, 4L -> 10000L,
      5L -> 0L))
    // calibration makes cross-source scales comparable: the top raw score
    // of each group lands at the same percentile regardless of magnitude
    val top = graft.operators.Sampling
      .quantileCalibrate(Seq(("A", 1L), ("A", 2L), ("B", 100L), ("B", 900L))
        .toDF("source", "score"), "source", col("score"))
      .filter(col("score") === 2L || col("score") === 900L)
      .select("pct_bp").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(10000L, 10000L))
  }
}

package graft

import org.apache.spark.sql.SparkSession
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
}

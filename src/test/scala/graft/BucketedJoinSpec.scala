package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins — the pre-shuffle that turns every
  * subsequent fact-to-fact join on the bucket key into a zero-exchange
  * merge. At 100 TB this is the difference between re-shuffling both fact
  * tables per query and paying the layout cost once at write time.
  */
class BucketedJoinSpec extends AnyFunSuite {

  // getOrCreate may hand back another suite's session, so every
  // join-strategy knob is set per-test via spark.conf (runtime-settable)
  // and the tables are written as EXTERNAL tables at an explicit temp path
  // (no dependence on the session's warehouse dir).
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("joins on the bucket key run with zero Exchange; results match the shuffled join") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/li_b")
        .format("parquet").saveAsTable("li_b")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/ord_b")
        .format("parquet").saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      // both sides read bucketed layout -> sort-merge join with NO shuffle
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))

      // and it computes the same thing as the plain shuffled join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Percentiles

/** Two-phase exact percentile selection vs the naive sorted k-th smallest,
  * across duplicate-heavy, degenerate, and tiny distributions. */
class PercentilesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def naive(values: Seq[Double], pcts: Seq[Int]): Seq[(Long, Double)] = {
    val sorted = values.sorted
    pcts.map { p =>
      val k = (p * values.length + 99) / 100 // ceil(p*n/100)
      (p.toLong, sorted(k - 1))
    }
  }

  private def run(values: Seq[Double], pcts: Seq[Int],
                  nBuckets: Int = 1024): Seq[(Long, Double)] = {
    import spark.implicits._
    Percentiles.exactKth(values.toDF("value"), "value", pcts, nBuckets)
      .orderBy("pct")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("duplicate-heavy skewed values match the sorted k-th smallest") {
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic pseudo-random mix: heavy duplication (mod 37) plus a
    // long sparse tail, negatives included
    val values = (1 to 5000).map { i =>
      if (i % 10 == 0) (i * 7919 % 1000).toDouble - 500.0
      else (i % 37).toDouble
    }
    assert(run(values, Seq(1, 50, 90, 99)) == naive(values, Seq(1, 50, 90, 99)))
  }

  test("degenerate distributions: all-equal, single row, two values") {
    spark.sparkContext.setLogLevel("ERROR")
    val allEq = Seq.fill(100)(42.0)
    assert(run(allEq, Seq(50, 99)) == naive(allEq, Seq(50, 99)))
    val one = Seq(7.5)
    assert(run(one, Seq(50, 99)) == naive(one, Seq(50, 99)))
    val two = Seq(-1.0, 1.0)
    assert(run(two, Seq(50, 99)) == naive(two, Seq(50, 99)))
  }

  test("nBuckets larger than the distinct-value count still exact") {
    spark.sparkContext.setLogLevel("ERROR")
    val values = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 8.0)
    assert(run(values, Seq(50, 90), nBuckets = 4096) ==
      naive(values, Seq(50, 90)))
    assert(run(values, Seq(50, 90), nBuckets = 2) ==
      naive(values, Seq(50, 90)))
  }

  test("exactKthByGroup: per-group results match per-group naive; degenerate groups fine") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // three groups with different shapes: uniform, duplicate-heavy, singleton
    val a = (1 to 97).map(i => ("a", ((i * 37) % 100 + 1).toDouble))
    val b = (1 to 50).map(i => ("b", if (i < 45) 5.0 else i.toDouble))
    val c = Seq(("c", 7.0))
    val df = (a ++ b ++ c).toDF("g", "v")
    val got = Percentiles.exactKthByGroup(df, "g", "v", Seq(50, 90, 99),
        nBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((g, vs) <- Seq("a" -> a, "b" -> b, "c" -> c))
      naive(vs.map(_._2), Seq(50, 90, 99)).foreach { case (p, want) =>
        assert(got((g, p)) == want, s"group $g p$p: ${got((g, p))} != $want")
      }
    assert(got.size == 9)
  }

  test("exactKthByGroup: every window is partitioned (fully group-parallel plan)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val plan = Percentiles.exactKthByGroup(df, "g", "v", Seq(50))
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "plan traversal found no Window nodes at all")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "grouped percentiles must not contain ANY unpartitioned window")
  }

  test("selection window is bucket-partitioned (no data-scale global window)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Percentiles.exactKth((1 to 100).map(_.toDouble).toDF("value"),
      "value", Seq(50))
    // logical plan: under AQE the physical tree hides behind
    // AdaptiveSparkPlanExec and a physical collect() is vacuous
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val unpart = windows.filter(_.partitionSpec.isEmpty)
    // exactly the constant-bounded bucket-count cumulative — never more;
    // and the check itself must SEE windows (guards against a vacuous
    // traversal that would silently pass everything)
    assert(windows.nonEmpty, "plan traversal found no Window nodes at all")
    assert(unpart.size == 1,
      s"expected 1 bucket-level unpartitioned window, got ${unpart.size}")
  }
}

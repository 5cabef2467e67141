package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Fuzzy

class FuzzySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resolve(dirty: Seq[(Long, String)], canon: Seq[(Long, String)]) = {
    import spark.implicits._
    Fuzzy.resolveByEdit(
        dirty.toDF("id", "s"), "id", "s",
        canon.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("every single-edit kind is recovered; two edits are not") {
    spark.sparkContext.setLogLevel("ERROR")
    val canon = Seq(1L -> "warehouse-catalog", 2L -> "pipeline-registry")
    val dirty = Seq(
      10L -> "warehouse-catalog",   // exact (dist 0)
      11L -> "warehouse-cattlog",   // insertion mid-string
      12L -> "warehuse-catalog",    // deletion mid-string
      13L -> "Xarehouse-catalog",   // substitution at pos 0 (prefix broken, suffix block catches)
      14L -> "warehouse-cataloX",   // substitution at end (suffix broken, prefix block catches)
      15L -> "wErehouse-cAtalog")   // TWO substitutions — must not match
    val got = resolve(dirty, canon)
    assert(got == Set((10L, 1L, 0), (11L, 1L, 1), (12L, 1L, 1),
      (13L, 1L, 1), (14L, 1L, 1)), s"got $got")
  }

  test("short strings and the 2*blockLen boundary match across lengths via length blocks") {
    spark.sparkContext.setLogLevel("ERROR")
    // blockLen = 4: short regime < 8 chars, boundary at exactly 8
    val canon = Seq(1L -> "cats", 2L -> "12345678")      // len 4 and len 8
    val dirty = Seq(
      10L -> "cat",        // deletion, len 3 vs 4 (both short)
      11L -> "catsy",      // insertion, len 5 vs 4
      12L -> "1234567",    // len 7 (short) vs len 8 (long) — boundary straddle
      13L -> "123456789")  // len 9 (long) vs len 8 (long)
    val got = resolve(dirty, canon)
    assert(got == Set((10L, 1L, 1), (11L, 1L, 1), (12L, 2L, 1), (13L, 2L, 1)),
      s"got $got")
  }

  test("resolveByEdit(maxDist=2) delegates to the PassJoin path") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val canon = Seq(1L -> "warehouse-catalog")
    val dirty = Seq(
      10L -> "warehouse-catalog",  // dist 0
      11L -> "wErehouse-cAtalog",  // dist 2 — unreachable at k=1
      12L -> "wErehOuse-cAtalog")  // dist 3 — out of range at k=2
    val got = Fuzzy.resolveByEdit(
        dirty.toDF("id", "s"), "id", "s",
        canon.toDF("id", "s"), "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((10L, 1L, 0), (11L, 1L, 2)), s"got $got")
  }

  test("resolveByEditK(2): equals brute-force all-pairs on a corpus of 0/1/2/3-edit variants") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val canon = (1 to 40).map(i => (i.toLong,
      s"canonical-record-number-${i}00-with-some-tail"))
    // dirty pool: exact copies, 1-edit, 2-edit, 3-edit (must NOT match),
    // plus short strings exercising the length-band fallback
    val dirty = canon.flatMap { case (i, s) =>
      Seq((i * 10L, s),
        (i * 10L + 1, s.patch(5, "", 1)),                 // 1 deletion
        (i * 10L + 2, s.patch(3, "", 1).patch(10, "X", 0)), // del + ins = 2
        (i * 10L + 3, "ZZ" + s.drop(1)))                  // sub+ins at front = 2
    } ++ Seq((9001L, "ab"), (9002L, "abc"), (9003L, "zzzzzz"))
    val canonAll = canon ++ Seq((501L, "abcd"))
    val got = {
      import graft.operators.Fuzzy
      Fuzzy.resolveByEditK(dirty.toDF("id", "s"), "id", "s",
          canonAll.toDF("id", "s"), "id", "s", maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val brute = (for {
      (di, ds) <- dirty
      (ci, cs) <- canonAll
      dist = {
        // classic DP levenshtein
        val dp = Array.tabulate(ds.length + 1)(identity)
        for (y <- 1 to cs.length) {
          var prev = dp(0); dp(0) = y
          for (x <- 1 to ds.length) {
            val cur = dp(x)
            dp(x) = math.min(math.min(dp(x) + 1, dp(x - 1) + 1),
              prev + (if (ds(x - 1) == cs(y - 1)) 0 else 1))
            prev = cur
          }
        }
        dp(ds.length)
      }
      if dist <= 2
    } yield (di, ci, dist)).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    // the 3-edit variants ("ZZ"+drop(1) relative to OTHER canonicals etc.)
    // prove the verify stage rejects over-distance candidates
    assert(brute.exists(_._3 == 2) && brute.exists(_._3 == 0))
  }

  test("plan is blocked equi-joins — no cartesian, no nested loop") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, s"name-number-$i")).toDF("id", "s")
    val plan = Fuzzy.resolveByEdit(a, "id", "s", a, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must stay blocked:\n$plan")
  }
}

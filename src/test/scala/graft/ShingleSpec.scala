package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ShingleHashes
import graft.operators.TextDedup

/** The native ShingleHashes expression must be BIT-IDENTICAL to the
  * declarative column formulation it replaces — the whole oracle-parity
  * story rests on it. */
class ShingleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaa",            // one distinct shingle at n=4
    "ab",              // shorter than n: the whole text is the shingle
    "",                // empty string
    "ünïcödé — ✓ 中文字符 test",  // multi-byte code points
    "abcabcabcabc",    // heavy duplication
    "x y z w v u t s r q p o n m l k")

  test("parity mode == array_sort(array_distinct(transform(charShingles, stableHash % P)))") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ShingleHashes.register(spark)
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(3, 4)) {
      val declarative = array_sort(array_distinct(transform(
        TextDedup.charShingles(col("text"), n),
        g => TextDedup.stableHash(g) % TextDedup.P)))
      val bad = df.select(
          ShingleHashes.shingleHashes(col("text"), n, parity = true,
            mod = TextDedup.P).as("native"),
          declarative.as("decl"))
        .filter(col("native") =!= col("decl"))
        .count()
      assert(bad == 0L, s"n=$n: native != declarative")
    }
  }

  test("no-mod parity mode == sorted distinct stableHash (60-bit)") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ShingleHashes.register(spark)
    val df = fixtures.toDF("text")
    val declarative = array_sort(array_distinct(transform(
      TextDedup.charShingles(col("text"), 4),
      g => TextDedup.stableHash(g))))
    val bad = df.select(
        ShingleHashes.shingleHashes(col("text"), 4, parity = true, mod = 0L)
          .as("native"),
        declarative.as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(bad == 0L)
  }

  test("production mode == pmod(xxhash64, P) over distinct shingles") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ShingleHashes.register(spark)
    val df = fixtures.toDF("text")
    val declarative = array_sort(array_distinct(transform(
      TextDedup.charShingles(col("text"), 3),
      g => pmod(xxhash64(g), lit(TextDedup.P)))))
    val bad = df.select(
        ShingleHashes.shingleHashes(col("text"), 3, parity = false,
          mod = TextDedup.P).as("native"),
        declarative.as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(bad == 0L)
  }

  test("output is ascending and duplicate-free") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    ShingleHashes.register(spark)
    val rows = fixtures.toDF("text")
      .select(ShingleHashes.shingleHashes(col("text"), 3, parity = true,
        mod = TextDedup.P).as("sh"))
      .collect().map(_.getSeq[Long](0))
    rows.foreach { s =>
      assert(s == s.sorted && s.distinct == s, s"not sorted-distinct: $s")
    }
  }
}

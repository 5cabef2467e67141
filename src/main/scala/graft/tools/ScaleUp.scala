package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ~N× corpus synthesizer for the scale rehearsal (VERDICT
  * r12 #1: every end-to-end number ever recorded is sf0.1/17 MB; the 100-TB
  * posture rests on probes). Each table becomes `copies` id-offset unions
  * of itself, keeping every foreign-key relationship intact — copy k is a
  * disjoint shard of the key space, so a correct linear-scaling operator
  * sees exactly k× the groups/joins/pairs:
  *
  *   - every int64 KEY column (custkey, orderkey, partkey, suppkey,
  *     event/user ids, doc_id, vec_id) is offset by k·1e8; nation/region
  *     (fixed 25/5-row dims, int32 keys) are copied verbatim so
  *     c_nationkey/s_nationkey FKs stay valid
  *   - documents.text is re-enciphered per copy with a Caesar letter
  *     substitution (shift k over [a-z]/[A-Z]; digits/punct/spaces
  *     unchanged): the copy is ISOMORPHIC to the base corpus — identical
  *     word lengths, frequencies, within-copy shingle/edit/near-dup
  *     structure — while sharing (almost) no character n-grams across
  *     copies. The first rehearsal used a per-WORD copy prefix instead
  *     and q_incr_dedup went 50x at 10x: the dedup family shingles on
  *     CHAR 3-grams, which a word prefix mostly preserves, so the copies
  *     were genuine cross-copy near-duplicates and the giant dup family's
  *     band buckets went hot (quadratic recovery) — see BASELINE.md r13
  *     scale-rehearsal wave. Substitution also keeps edit distances
  *     between cross-copy words large (a prefix kept them at 2, inside
  *     fuzzy-join thresholds). n_chars is preserved exactly (source
  *     invariant: n_chars = length(text), translate is length-preserving)
  *   - embeddings.embedding is cyclically shifted by k positions —
  *     preserves norms and within-copy distance structure, decorrelates
  *     across copies (verbatim copies would make every vector's top-k
  *     neighbor list degenerate at distance 0)
  *   - events.props carries no ids (shape {"k": N}) and rides verbatim
  *
  * Usage: ScaleUp [srcDir] [dstDir] [copies]   (defaults: /root/testdata/
  * sf0.1, dev/sf1, 10). Output layout mirrors TESTDATA.md (one parquet
  * path per table), so SparkEntry.queries/Bench accept the dir as-is. */
object ScaleUp {

  private val Off = 100000000L // > any sf0.1 key; 10 copies stay << 2^63

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("dev/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // shift k%26 == 0 would make copy k byte-identical to the base text —
    // exactly the degenerate duplicate corpus the cipher exists to avoid
    require(copies <= 26, s"copies=$copies: only 25 distinct Caesar shifts")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val K = col("_k").cast("long")
    def fan(df: DataFrame): DataFrame =
      df.withColumn("_k", explode(lit((0 until copies).toArray)))
    def offset(keys: String*)(df: DataFrame): DataFrame =
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + K * Off))

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      val out = df.drop("_k")
      val d = if (parts > 1) out.repartition(parts) else out.coalesce(1)
      d.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> $dst/$name.parquet")
    }

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")

    // fixed dims: verbatim (their int32 keys are shared by all copies)
    Seq("region", "nation").foreach(n => write(n, read(n), 1))

    write("customer", offset("c_custkey")(fan(read("customer"))), 4)
    write("supplier", offset("s_suppkey")(fan(read("supplier"))), 1)
    write("part", offset("p_partkey")(fan(read("part"))), 2)
    write("orders", offset("o_orderkey", "o_custkey")(fan(read("orders"))), 8)
    write("lineitem",
      offset("l_orderkey", "l_partkey", "l_suppkey")(fan(read("lineitem"))), 32)
    write("events", offset("event_id", "user_id")(fan(read("events"))), 8)

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rotAlpha(k: Int): (String, String) = {
      val s = k % 26
      (lower, lower.drop(s) + lower.take(s)) match {
        case (from, to) => (from + upper, to + (upper.drop(s) + upper.take(s)))
      }
    }
    val enciphered = (1 until copies).foldLeft(
        when(col("_k") === 0, col("text"))) { (acc, k) =>
      val (from, to) = rotAlpha(k)
      acc.when(col("_k") === k, translate(col("text"), from, to))
    }.otherwise(col("text"))
    val docs = offset("doc_id")(fan(read("documents")))
      .withColumn("text", enciphered)
    write("documents", docs, 8)
    // Decorrelation guard (r13 review): translate shifts LETTERS only, so
    // a doc dominated by digits/punct/non-Latin script would ride through
    // (near-)identical in every copy — re-creating the cross-copy
    // duplicate blowup the cipher exists to prevent, silently, on a future
    // corpus. Measure instead of assuming: cross-copy exact-duplicate
    // texts beyond the base corpus's own dup rate fail the generation.
    val out = spark.read.parquet(s"$dst/documents.parquet")
    val nTotal = out.count()
    val nDistinct = out.select("text").distinct().count()
    val baseDistinct = read("documents").select("text").distinct().count()
    val expected = baseDistinct * copies
    require(nDistinct >= expected - copies, // slack: hash-collision noise
      s"cipher decorrelation failed: $nDistinct distinct texts of $nTotal " +
        s"(expected ~$expected) — the corpus carries low-alphabetic docs " +
        "the Caesar transform cannot decorrelate; extend the transform")
    println(s"[scaleup] decorrelation check: $nDistinct distinct texts " +
      s"(base $baseDistinct x $copies copies)")

    val dim = 64 // TESTDATA.md embeddings are fixed-width float[64]
    def shifted(e: Column): Column = {
      val s = (K % dim).cast("int")
      concat(slice(e, s + lit(1), lit(dim) - s), slice(e, lit(1), s))
    }
    val emb = offset("vec_id")(fan(read("embeddings")))
      .withColumn("embedding", shifted(col("embedding")))
    write("embeddings", emb, 4)

    spark.stop()
  }
}

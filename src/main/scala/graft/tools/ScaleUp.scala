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
  *   - documents.text is re-enciphered per copy with a KEYED full-alphabet
  *     permutation (Fisher-Yates seeded by the copy index — 26! keys, so
  *     the ladder has no copy cap; digits/punct/spaces unchanged): the
  *     copy is ISOMORPHIC to the base corpus — identical
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
  *   - embeddings.embedding is cyclically shifted by k positions AND
  *     sign-flipped by a per-copy deterministic pattern (both orthogonal:
  *     norms and within-copy distance structure preserved exactly) —
  *     decorrelates across copies at any ladder height (verbatim copies
  *     would make every vector's top-k neighbor list degenerate at
  *     distance 0; shift alone wraps at 64 copies)
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
    // r14 (VERDICT r13 #1): the per-copy text transform is a KEYED
    // full-alphabet permutation (26! keys), not a Caesar shift (25 keys) —
    // the 26-copy ladder cap is gone. Keys beyond ~1e9 copies would
    // collide Fisher-Yates seeds long before permutations run out; cap
    // generously below that.
    require(copies <= 1000000, s"copies=$copies: unreasonable fan-out")
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
    // Keyed permutation per copy: deterministic Fisher-Yates seeded by the
    // copy index (java.util.Random is a fixed LCG — same seed, same
    // permutation, forever). A permutation is ISOMORPHIC within copy like
    // the Caesar shift was (bijective on letters: word lengths,
    // frequencies, shingle/edit structure preserved exactly) while two
    // different keys share only their chance fixed points across copies —
    // the decorrelation guard below MEASURES the result rather than
    // trusting the argument. Copy 0 stays verbatim (the base corpus).
    def permuted(k: Int): String = {
      val a = lower.toCharArray
      val rnd = new java.util.Random(k * 0x9E3779B97F4A7C15L + 0x243F6A8885A308DL)
      var i = a.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      new String(a) + new String(a).toUpperCase
    }
    val permDf = spark.createDataFrame(
        (0 until copies).map(k =>
          (k, if (k == 0) lower + upper else permuted(k))))
      .toDF("_k", "__to")
    val docs = offset("doc_id")(fan(read("documents")))
      .join(broadcast(permDf), Seq("_k"))
      // StringTranslate accepts non-foldable matching/replace (it rebuilds
      // its dict when the inputs change row-to-row) — one join + one
      // translate instead of a `copies`-branch when-chain
      .withColumn("text", expr(s"translate(text, '$lower$upper', __to)"))
      .drop("__to")
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
        "a letter permutation cannot decorrelate; extend the transform")
    println(s"[scaleup] decorrelation check: $nDistinct distinct texts " +
      s"(base $baseDistinct x $copies copies)")

    val dim = 64 // TESTDATA.md embeddings are fixed-width float[64]
    def shifted(e: Column): Column = {
      val s = (K % dim).cast("int")
      concat(slice(e, s + lit(1), lit(dim) - s), slice(e, lit(1), s))
    }
    // Beyond 64 copies the cyclic shift alone collides (k % dim wraps, and
    // copy 64 would carry copy 0's vectors VERBATIM — every cross-copy
    // neighbor at distance 0, the degenerate-ANN corpus this transform
    // exists to prevent). Compose with a per-copy deterministic SIGN-FLIP
    // pattern: both maps are orthogonal, so norms and every within-copy
    // distance are preserved exactly, while distinct (shift, signs) pairs
    // decorrelate all copies at any ladder height. Copy 0 stays verbatim.
    def signPattern(k: Int): Array[Float] = {
      val rnd = new java.util.Random(k * 0x5851F42D4C957F2DL + 0x14057B7EF767814FL)
      Array.fill(dim)(if (k == 0 || rnd.nextBoolean()) 1.0f else -1.0f)
    }
    val signDf = spark.createDataFrame(
        (0 until copies).map(k => (k, signPattern(k))))
      .toDF("_k", "__signs")
    val emb = offset("vec_id")(fan(read("embeddings")))
      .join(broadcast(signDf), Seq("_k"))
      .withColumn("embedding",
        zip_with(shifted(col("embedding")), col("__signs"), (x, s) => x * s))
      .drop("__signs")
    write("embeddings", emb, 4)
    // Embedding decorrelation guard (same discipline as the text guard):
    // distinct vectors must multiply with the copy count, or two copies
    // collapsed onto each other and every ANN reading is degenerate.
    val embOut = spark.read.parquet(s"$dst/embeddings.parquet")
    val eDistinct = embOut.select("embedding").distinct().count()
    val eBase = read("embeddings").select("embedding").distinct().count()
    require(eDistinct >= eBase * copies - copies,
      s"embedding decorrelation failed: $eDistinct distinct vectors " +
        s"(expected ~${eBase * copies})")
    println(s"[scaleup] embedding decorrelation: $eDistinct distinct " +
      s"(base $eBase x $copies copies)")

    spark.stop()
  }
}

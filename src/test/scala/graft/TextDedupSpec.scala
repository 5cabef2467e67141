package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup

/** Production-hash path (xxhash64) must mirror the oracle-parity (md5) path
  * structurally: same cardinalities, deterministic across runs — only the
  * hash values differ. */
class TextDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bloomDiff: exact set difference — bloom only routes, anti-join removes FPs") {
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.operators.Blocklist
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val blocklist = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("blocked_id"))
    // tiny filter (high fpp) forces real false positives through the
    // maybe-path, so this exercises the FP-removal join, not just routing
    val got = Blocklist.bloomDiff(docs, "doc_id", blocklist, "blocked_id",
        expectedItems = 8, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("ngramContamination: benchmark members and verbatim borrowers flagged, disjoint text clean") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated text with zero shared characters sequences!!"),
      (3L, "plagiarized: the quick brown fox jumps appears verbatim here too")
    ).toDF("doc_id", "text")
    val benchmark = corpus.filter($"doc_id" === 1L)
    val got = TextDedup.ngramContamination(corpus, "doc_id", "text", benchmark, "text")
      .orderBy("doc_id").collect()
    assert(got(0).getBoolean(2), "benchmark member must flag itself")
    assert(!got(1).getBoolean(2) && got(1).getLong(1) == 0, "disjoint doc flagged")
    assert(got(2).getBoolean(2) && got(2).getLong(1) > 0,
      "doc borrowing a verbatim benchmark span must flag")
    // the borrower shares fewer distinct grams than the full benchmark doc
    assert(got(2).getLong(1) < got(0).getLong(1))
  }

  test("redactPii: counts before redaction, masks all three kinds, leaves clean text alone") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io call +44-123-4567 ssn 987-65-4321"),
      (2L, "no pii here, just 12-34 and version 1.2.3"),
      (3L, "edge: 123-45-6789123 is not an ssn (no boundary)")
    ).toDF("id", "text")
    val got = TextAnalysis.redactPii(df, "id", "text")
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 2 && got(0).getLong(2) == 1 && got(0).getLong(3) == 1)
    assert(got(0).getString(4) ==
      "mail [EMAIL] and [EMAIL] call [PHONE] ssn [SSN]")
    assert(got(1).getLong(1) == 0 && got(1).getLong(2) == 0 && got(1).getLong(3) == 0)
    assert(got(1).getString(4) == "no pii here, just 12-34 and version 1.2.3")
    // \b guards: a 7-digit tail is not an SSN
    assert(got(2).getLong(3) == 0)
  }

  test("xxhash64 production path: same shape, deterministic, cheaper hash") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)

    val sigO = TextDedup.minHashSignature(docs, "doc_id", "text")
    val sigP = TextDedup.minHashSignature(docs, "doc_id", "text", oracleParity = false)
    assert(sigO.count() == sigP.count())
    assert(sigO.columns.toSeq == sigP.columns.toSeq)
    // deterministic across evaluations
    assert(sigP.collect().toSet == TextDedup.minHashSignature(
      docs, "doc_id", "text", oracleParity = false).collect().toSet)

    val shP = TextDedup.simHashSignature(docs, "doc_id", "text", oracleParity = false)
    assert(shP.count() == 100)
    // 60-bit mask holds
    assert(shP.collect().forall { r =>
      val v = r.getAs[Long]("simhash"); v >= 0 && v < (1L << 60)
    })

    val wO = TextDedup.winnowingFingerprints(docs, "doc_id", "text")
    val wP = TextDedup.winnowingFingerprints(docs, "doc_id", "text", oracleParity = false)
    // winnowing density depends only on hash distribution; counts are close
    val (co, cp) = (wO.count(), wP.count())
    assert(math.abs(co - cp) < co / 5, s"fingerprint counts diverged: $co vs $cp")
  }

  test("cdcRepeatedChunks: shared boilerplate found even when shifted; unique docs zero") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val boiler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, boiler),                                  // the boilerplate itself
      (2L, "completely unrelated preamble words here " + boiler), // SHIFTED copy
      (3L, "no shared content in this document at all whatsoever"))
      .toDF("doc_id", "text")
    val out = TextDedup.cdcRepeatedChunks(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // content-defined boundaries realign after the inserted prefix, so the
    // interior chunks of the boilerplate hash identically in docs 1 and 2
    assert(out(0).getLong(3) > 0, s"doc 1 found no repeated chunks: ${out(0)}")
    assert(out(1).getLong(3) > 0, s"shifted copy not caught: ${out(1)}")
    assert(out(0).getDouble(5) > 0.5, "boilerplate doc should be mostly repeated")
    assert(out(2).getLong(3) == 0 && out(2).getDouble(5) == 0.0)
    // chunk counts partition the tokens
    assert(out.forall(r => r.getLong(4) <= r.getInt(1)))
  }

  test("removeRepeatedSpans: shared 5-gram span deleted, unique remainder kept in order") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val boiler = "all rights reserved by the publisher" // 6 tokens → 2 5-grams
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"one two three $boiler"),
      (3L, "entirely unique text with no shared spans anywhere at all"))
      .toDF("doc_id", "text")
    val out = TextDedup.removeRepeatedSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    // the shared 6-token span is scrubbed from both carriers; the unique
    // surroundings survive in original order
    assert(out(0).getString(3) == "alpha beta gamma delta", s"got ${out(0)}")
    assert(out(0).getLong(2) == 6L)
    assert(out(1).getString(3) == "one two three")
    assert(out(1).getLong(2) == 6L)
    // a doc with no cross-doc gram is untouched
    assert(out(2).getLong(2) == 0L &&
      out(2).getString(3) == "entirely unique text with no shared spans anywhere at all")
  }

  test("unigramSurprisal: rare-vocabulary docs score above boilerplate docs") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common common"),          // 1 token repeated corpus-wide
      (2L, "common common rare1 rare2"),            // half rare
      (3L, "unique1 unique2 unique3 unique4"))      // all singletons
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val S = 12L // corpus tokens
    // doc 1: every token has c=6 -> rarity = 1e6*12/6 = 2_000_000 exactly
    assert(out(0).getLong(3) == 1000000L * S / 6)
    assert(out(0).getLong(1) == 4L)
    // monotone: more singletons -> higher mean rarity
    assert(out(0).getLong(3) < out(1).getLong(3))
    assert(out(1).getLong(3) < out(2).getLong(3))
    // doc 3: all c=1 -> mean = 1e6*12
    assert(out(2).getLong(3) == 1000000L * S)
  }

  test("bigramSurprisal: formulaic transitions score below novel ones, closed form") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),      // "a b" x3, "b a" x2 — fully templated
      (2L, "a b c d e f"),      // every bigram a singleton
      (3L, "x"))                // single token: no bigrams, drops out
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 2) // doc 3 has no bigrams
    // doc 1: "a b": c(a·)=3+1(from doc2)=4, c(a b)=3+1=4 -> rarity 1e6
    //        "b a": c(b·)=2+1=3, c(b a)=2 -> 1e6*3/2
    // n_big=5; sum = 3*1e6 + 2*1_500_000 = 6e6; mean = 1_200_000
    assert(out(0).getAs[Long]("n_big") == 5L)
    assert(out(0).getAs[Long]("mean_rarity") == 1200000L)
    // every doc-2 bigram unique given its left counts -> higher mean
    assert(out(1).getAs[Long]("mean_rarity") > out(0).getAs[Long]("mean_rarity"))
  }

  test("backoffSurprisal: exact backoff ladder against a reference slice") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // model slice: T=6; cu the=2 cat=2 sat=1 ran=1; bigrams "the cat"x2,
    // "cat sat", "cat ran" (cl the=2 cat=2); trigrams "the cat sat",
    // "the cat ran" (context "the cat" count 2)
    val ref = Seq((100L, "the cat sat"), (101L, "the cat ran"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat"),             // trigram hit
      (2L, "x cat ran"),               // backs off to bigram "cat ran"
      (3L, "x y sat"),                 // backs off to unigram "sat"
      (4L, "the cat apple"),           // OOV target token
      (5L, "hi there"),                // < 3 tokens: drops out
      (6L, "the cat sat the cat ran")) // 4 positions, mixed levels
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .backoffSurprisal(docs, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    def row(i: Int) = out.find(_.getLong(0) == i).get
    // d1: (1e6 * cc=2) div ct=1 = 2_000_000 at level 3
    assert(row(1).getAs[Long]("n_tri") == 1L &&
      row(1).getAs[Long]("mean_rarity") == 2000000L)
    // d2: ((1e6 * cl(cat)=2) div cb=1) * 5 div 2 = 5_000_000 at level 2
    assert(row(2).getAs[Long]("n_bi") == 1L &&
      row(2).getAs[Long]("mean_rarity") == 5000000L)
    // d3: ((1e6 * T=6) div cu(sat)=1) * 25 div 4 = 37_500_000 at level 1
    assert(row(3).getAs[Long]("n_uni") == 1L &&
      row(3).getAs[Long]("mean_rarity") == 37500000L)
    // d4: OOV cap (1e6 * 7) * 25 div 4 = 43_750_000 — above every in-vocab
    assert(row(4).getAs[Long]("n_oov") == 1L &&
      row(4).getAs[Long]("mean_rarity") == 43750000L)
    // the ladder is strictly ordered: tri < bi < uni < oov
    assert(Seq(1, 2, 3, 4).map(row(_).getAs[Long]("mean_rarity"))
      .sliding(2).forall { case Seq(a, b) => a < b })
    // d6 positions: tri 2e6, uni("the") (6 div 2)*1e6*25 div 4 = 18_750_000,
    // bi("the cat") ((1e6*2) div 2)*5 div 2 = 2_500_000, tri 2e6
    val d6 = row(6)
    assert(d6.getAs[Long]("n_scored") == 4L && d6.getAs[Long]("n_tri") == 2L &&
      d6.getAs[Long]("n_bi") == 1L && d6.getAs[Long]("n_uni") == 1L &&
      d6.getAs[Long]("n_oov") == 0L)
    assert(d6.getAs[Long]("sum_rarity") == 25250000L &&
      d6.getAs[Long]("mean_rarity") == 6312500L)
  }

  test("contrastivePairs: positive is the best dup, negatives ranked below threshold") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val core = "the quick brown fox jumps over the lazy dog near the riverbank"
    val docs = Seq(
      (1L, core),                                             // anchor
      (2L, core),                                             // verbatim dup -> positive
      (3L, "a quick brown fox leaps over some lazy dog far from a riverbank"),
      (4L, "completely unrelated text about spark query planning internals"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextDedup
      .contrastivePairs(docs, "doc_id", "text").collect()
    assert(out.nonEmpty, "fixture surfaced no triples")
    // every row: positive at/above 0.6, negative strictly below, both
    // above the 0.25 candidate floor
    out.foreach { r =>
      assert(r.getAs[Double]("pos_jac") >= 0.6)
      val nj = r.getAs[Double]("neg_jac")
      assert(nj >= 0.25 && nj < 0.6, s"neg_jac $nj out of band")
    }
    // the verbatim pair is the positive for anchor 1 (and symmetrically 2)
    val a1 = out.filter(_.getAs[Long]("anchor_id") == 1L)
    assert(a1.nonEmpty && a1.forall(_.getAs[Long]("pos_id") == 2L))
    assert(a1.forall(_.getAs[Long]("neg_id") == 3L))
    // the unrelated doc appears nowhere
    assert(!out.exists(r => r.getAs[Long]("anchor_id") == 4L ||
      r.getAs[Long]("pos_id") == 4L || r.getAs[Long]("neg_id") == 4L))
    // ranks are 1..n without gaps per anchor, ordered by jac desc
    out.groupBy(_.getAs[Long]("anchor_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("neg_rank"))
      assert(sorted.map(_.getAs[Int]("neg_rank")).toSeq ==
        (1 to sorted.length).toSeq)
      val jacs = sorted.map(_.getAs[Double]("neg_jac")).toSeq
      assert(jacs == jacs.sorted.reverse)
    }
  }

  test("paragraphDedup: keep-first across docs, in-doc repeats, rebuild order") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta\ngamma\nalpha beta"), // in-doc repeat: 3rd para drops
      (2L, "gamma\ndelta"),                  // "gamma" already in d1 -> drops
      (3L, "\n\n"),                          // only empty paragraphs
      (4L, "alpha beta"))                    // whole doc seen in d1 -> empty
      .toDF("doc_id", "text")
    val out = graft.operators.TextDedup
      .paragraphDedup(docs, "doc_id", "text", "\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_par"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((3L, 1L, "alpha beta\ngamma")))
    assert(out(2L) == ((2L, 1L, "delta")))
    assert(out(3L) == ((0L, 0L, "")))
    assert(out(4L) == ((1L, 1L, "")))
    assert(out.size == 4)
  }

  test("distributionDrift: exact TV distance and hapax ratio per group") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // corpus counts: a:3 b:1 c:1, N=5.
    // A = "a a b": Ns=3, TV = 1/2(|2/3-3/5| + |1/3-1/5| + 1/5) = 0.2
    // B = "a c":   Ns=2, TV = 1/2(|1/2-3/5| + 1/5 + |1/2-1/5|) = 0.3
    val docs = Seq(("A", "a a b"), ("B", "a c")).toDF("source", "text")
    val out = graft.operators.TextAnalysis
      .distributionDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_tokens") == 3L &&
      out("A").getAs[Long]("n_types") == 2L &&
      out("A").getAs[Long]("hapax") == 1L &&
      out("A").getAs[Long]("hapax_bp") == 5000L &&
      out("A").getAs[Long]("tv_bp") == 2000L)
    assert(out("B").getAs[Long]("n_tokens") == 2L &&
      out("B").getAs[Long]("hapax") == 2L &&
      out("B").getAs[Long]("hapax_bp") == 10000L &&
      out("B").getAs[Long]("tv_bp") == 3000L)
  }

  test("groupOverlap: identical groups estimate 10000 bp, disjoint 0") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // g1 and g2 share the exact shingle set (J=1 -> every component
    // matches); g3 uses a disjoint alphabet (J=0 -> no component matches,
    // barring a 60-bit md5 collision)
    val docs = Seq(
      ("g1", "the quick brown fox"), ("g1", "jumps over lazy dogs"),
      ("g2", "jumps over lazy dogs"), ("g2", "the quick brown fox"),
      ("g3", "ZZZZ XXXX YYYY WWWW VVVV")).toDF("source", "text")
    val out = graft.operators.TextDedup.groupOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("k_match"), r.getAs[Long]("jaccard_bp")))).toMap
    assert(out.size == 3) // C(3,2) ordered pairs
    assert(out(("g1", "g2")) == ((8L, 10000L)))
    assert(out(("g1", "g3")) == ((0L, 0L)))
    assert(out(("g2", "g3")) == ((0L, 0L)))
  }

  test("compressionRatio: repetitive < prose < random; deterministic; empty safe") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      (1L, "spam spam spam " * 60),                                   // repetitive
      (2L, ("the quick brown fox jumps over a lazy dog near the " +
        "river bank while autumn leaves drift slowly downstream ") * 9), // prose-ish
      (3L, Seq.fill(900)(rnd.nextPrintableChar()).mkString),           // high entropy
      (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L),
      s"ratio ordering must be repetitive < prose < random: $out")
    assert(out(4L) == 0L)
    // deterministic re-run
    val again = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out)
  }

  test("collocations: bound pairs out-rank frequent-but-independent pairs; closed form") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, size, split}
    import graft.operators.TextAnalysis
    // "new york" only ever occurs as a pair; "the cat" / "the dog" mix freely
    val docs = (1 to 10).map(i =>
      (i.toLong, "new york " + (if (i % 2 == 0) "the cat " else "the dog ") * 3 + "the end"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5, topK = 10)
      .collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    // exclusive pair ranks strictly above the promiscuous article pairs
    assert(byPair(("new", "york")) > byPair(("the", "cat")),
      s"PMI ordering wrong: $byPair")
    assert(byPair(("new", "york")) > byPair(("the", "dog")))
    // closed form: every "new" is followed by "york" -> p(ab) = p(a) = p(b)
    // so the bp score is floor(N^2 * 1e4 / (n^2 * B/n_ab))... verify against
    // the direct formula with the exact counts the corpus implies
    val r = out.find(x => x.getString(0) == "new").get
    val (nAb, nA, nB2) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nAb == 10L && nA == 10L && nB2 == 10L)
    val n = docs.select(explode(split(col("text"), " "))).count()
    val b = out.head.getLong(2) // not B; recompute B exactly below
    val totB = docs.select((size(split(col("text"), " ")) - 1).cast("long")).collect().map(_.getLong(0)).sum
    assert(r.getLong(5) == nAb * n * n * 10000L / (nA * nB2 * totB))
    assert(b > 0)
  }

  test("incrementalDedup: verbatim copies match, fresh docs pass, one row per incoming doc") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy of 1
      (102L, "completely different words nowhere else in this corpus x"), // fresh
      (103L, "one two three four five six seven eight nine ten"))         // copy of 2
      .toDF("doc_id", "text")
    val out = TextDedup.incrementalDedup(existing, incoming, "doc_id", "text")
      .orderBy("new_id").collect()
    assert(out.length == 3) // one row per incoming doc, matched or not
    assert(out(0).getLong(0) == 101L && out(0).getLong(1) == 1L &&
      out(0).getDouble(2) == 1.0 && out(0).getBoolean(3))
    assert(out(1).getLong(0) == 102L && out(1).isNullAt(1) &&
      out(1).getDouble(2) == 0.0 && !out(1).getBoolean(3))
    assert(out(2).getLong(0) == 103L && out(2).getLong(1) == 2L &&
      out(2).getBoolean(3))

    // a tiny ceiling pushes every bucket over the cap: the hybrid exact
    // path alone must reproduce the same matches (recall never below LSH)
    val capped = TextDedup.incrementalDedup(existing, incoming, "doc_id", "text",
        maxBucket = 1)
      .orderBy("new_id").collect()
    assert(capped.map(r => (r.getLong(0), r.getBoolean(3))).toSeq ==
      out.map(r => (r.getLong(0), r.getBoolean(3))).toSeq)
  }

  test("hammingNearDupPairs == brute force; identical sigs collapse to reps") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // deterministic signatures with engineered structure: a base value,
    // 1/2/3/4-bit flips of it, a far value, and EXACT copies (ids 100+)
    // that must collapse into their lowest-id representative
    val base = 0x0ABCDEF012345L
    val rows = Seq(
      1L -> base,
      2L -> (base ^ (1L << 3)),                                  // ham 1
      3L -> (base ^ (1L << 17) ^ (1L << 44)),                    // ham 2
      4L -> (base ^ (1L << 5) ^ (1L << 25) ^ (1L << 59)),        // ham 3
      5L -> (base ^ (1L << 1) ^ (1L << 2) ^ (1L << 40) ^ (1L << 41)), // ham 4
      6L -> 0x0123123412345L,
      100L -> base, 101L -> base,                                // copies of 1
      102L -> (base ^ (1L << 3)))                                // copy of 2
    def brute(k: Int): Set[(Long, Long, Int)] = {
      val reps = rows.groupBy(_._2).map { case (h, rs) => (rs.map(_._1).min, h) }.toSeq
      (for {
        (i1, h1) <- reps; (i2, h2) <- reps if i1 < i2
        d = java.lang.Long.bitCount(h1 ^ h2) if d <= k
      } yield (i1, i2, d)).toSet
    }
    for (k <- Seq(1, 2, 3, 4, 6)) { // incl. k=6: 60 % 7 != 0 segment split
      val got = TextDedup.hammingNearDupPairs(
          rows.toDF("id", "sig"), "id", "sig", maxHamming = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(k), s"k=$k: got $got expected ${brute(k)}")
    }
    // ham-3 radius: exactly the 1..3-flip family around rep 1 plus the
    // disjoint-flip pair (2,3) at distance 1+2; the engineered copies
    // never surface under their own ids (collapsed into reps 1 and 2)
    val p3 = TextDedup.hammingNearDupPairs(
        rows.toDF("id", "sig"), "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)),
      s"unexpected ham-3 set $p3")
    assert(!p3.exists(p => p._1 >= 100L || p._2 >= 100L),
      "a collapsed copy surfaced under its own id")
  }

  test("fingerprintOverlapPairs: an embedded document surfaces at high containment") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def block(seed: String, n: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until n).map(i => md.digest(s"${seed}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString(" ")
    }
    val host = block("host", 20)                 // ~660 chars
    val chunk = host.substring(132, 396)         // embedded span of host
    val other = block("other", 8)
    val docs = Seq((1L, host), (2L, chunk), (3L, other)).toDF("doc_id", "text")
    val pairs = TextDedup.fingerprintOverlapPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // the chunk shares nearly all of ITS fingerprints with the host —
    // symmetric whole-doc Jaccard would score this pair low, containment
    // must score it high; the unrelated doc never pairs with either
    assert(pairs.contains((1L, 2L)), s"embedded chunk not detected: $pairs")
    assert(pairs((1L, 2L)) >= 0.8,
      s"containment ${pairs((1L, 2L))} too low for an embedded span")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc produced an overlap pair")
  }
}

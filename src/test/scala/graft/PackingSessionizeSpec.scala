package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Packing, Sessionize, TextAnalysis, TextDedup, Sampling}

/** Specs for the round-4 training-data operators: sessionization, token
  * packing/chunking, exact-substring coverage, keyword extraction,
  * length trimming, shard manifests. */
class PackingSessionizeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sessionize: gap rule splits sessions, tie column breaks equal timestamps") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // user 1: events at t=0s, 10s, 2000s (gap>1800 -> new session), 2005s
    // user 2: one event; equal-ts pair ordered by event_id stays one session
    val ev = Seq(
      (1L, 0L, 10L), (1L, 10000000L, 11L), (1L, 2000000000L, 12L),
      (1L, 2005000000L, 13L),
      (2L, 5000000L, 20L), (2L, 5000000L, 21L))
      .toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", 1800L)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 10000000L),
      (1L, 2L, 2L, 5000000L),
      (2L, 1L, 2L, 0L)))
  }

  test("packTokenStream: two-phase prefix sum == naive global cumsum, any partitioning") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = (1L to 97L).map(i => (i, ((i * 7) % 13 + 1).toInt))
      .toDF("doc_id", "n")
      .repartition(7) // scrambled placement; operator must re-range-partition
    val got = Packing.packTokenStream(docs, "doc_id", col("n"), contextLen = 10)
      .orderBy("doc_id").collect()
    var running = 0L
    (1L to 97L).zip(got).foreach { case (i, r) =>
      val n = (i * 7) % 13 + 1
      assert(r.getAs[Long]("start_tok") == running, s"doc $i")
      assert(r.getAs[Long]("first_bin") == running / 10)
      assert(r.getAs[Long]("last_bin") == (running + n - 1) / 10)
      running += n
    }
  }

  test("weightedSample: draws land per exact interval arithmetic; zero weights never drawn") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, if (i % 10 == 0) 0L else (i * 3) % 17 + 1))
      .toDF("doc_id", "w")
      .repartition(7) // scrambled placement; prefix sum must re-range-partition
    val got = Sampling.weightedSample(docs, "doc_id", col("w"),
        nDraws = 100, seed = 7L, nBuckets = 16)
      .orderBy("draw_idx").collect()

    // oracle by hand: intervals in doc_id order over positive weights
    val wByDoc = (1L to 50L).map(i => i -> (if (i % 10 == 0) 0L else (i * 3) % 17 + 1))
    val pos = wByDoc.filter(_._2 > 0)
    val starts = pos.map(_._2).scanLeft(0L)(_ + _)
    val intervals = pos.zip(starts).map { case ((id, w), lo) => (id, lo, lo + w) }
    val total = starts.last
    def md5Hash(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    val expected = (0L until 100L).map { i =>
      val p = md5Hash(s"7_$i") % total
      val doc = intervals.find { case (_, lo, hi) => p >= lo && p < hi }.get
      (i, doc._1)
    }
    assert(got.length == 100, "exactly one row per draw")
    got.zip(expected).foreach { case (r, (i, id)) =>
      assert(r.getLong(0) == i && r.getLong(1) == id,
        s"draw $i: got ${r.getLong(1)}, expected $id")
    }
    assert(got.forall(_.getLong(1) % 10 != 0), "zero-weight docs must never be drawn")

    // deterministic under a different partitioning and bucket count
    val again = Sampling.weightedSample(docs.repartition(3), "doc_id", col("w"),
        nDraws = 100, seed = 7L, nBuckets = 5)
      .orderBy("draw_idx").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("chunkTokens: boundary cases — short doc, exact fit, overlap tail") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),                       // 3 toks < chunk -> 1 chunk
      (2L, (1 to 8).map("t" + _).mkString(" ")), // 8 toks = exact 2 strides
      (3L, (1 to 11).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.chunkTokens(docs, "doc_id", "text", chunkSize = 8, stride = 4)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.count(_._1 == 1L) == 1 && got.head._3 == "a b c")
    // 8 toks: extra=0 -> single chunk covering all
    assert(got.count(_._1 == 2L) == 1)
    assert(got.find(_._1 == 2L).get._3 == (1 to 8).map("t" + _).mkString(" "))
    // 11 toks: extra=3 -> ceil(3/4)=1 extra chunk at offset 4 (toks 5..11)
    val d3 = got.filter(_._1 == 3L)
    assert(d3.map(_._2).toSeq == Seq(0, 1))
    assert(d3(0)._3 == (1 to 8).map("t" + _).mkString(" "))
    assert(d3(1)._3 == (5 to 11).map("t" + _).mkString(" "))
  }

  test("repeatedNgramCoverage: shared 5-gram covers exactly its span; unique docs zero") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val shared = "one two three four five"
    val docs = Seq(
      (1L, s"$shared alpha beta"),   // tokens 1-5 covered, 6-7 not
      (2L, s"gamma $shared delta"),  // tokens 2-6 covered
      (3L, "unrelated text entirely here now"))
      .toDF("doc_id", "text")
    val got = TextDedup.repeatedNgramCoverage(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 7, 5L), (2L, 7, 5L), (3L, 5, 0L)))
  }

  test("topKeywords: count-desc rank with token-text tie-break, stopwords excluded") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "zz zz aa bb bb the the the")).toDF("doc_id", "text")
    val got = TextAnalysis.topKeywords(docs, "doc_id", "text", 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    // counts: zz=2, bb=2, aa=1; 'the' is a stopword; tie zz/bb -> bb first
    assert(got.toSeq == Seq((1, "bb", 2L), (2, "zz", 2L), (3, "aa", 1L)))
  }

  test("lengthPercentileTrim: discrete thresholds hit ceil(p*n)-th smallest") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 10 docs with token counts 1..10; p05 -> ceil(0.5)=1st smallest = 1,
    // p95 -> ceil(9.5)=10th smallest = 10 => nothing trimmed. With
    // 20/80 percentiles: lo = 4th smallest = 4, hi = 16th -> none; use
    // explicit rationals to exercise a real trim.
    val docs = (1 to 10).map(i => (i.toLong, (1 to i).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lengthPercentileTrim(docs, "doc_id", "text",
        loNum = 20, hiNum = 80, den = 100)
      .orderBy("doc_id").collect()
    // lo = ceil(0.2*10)=2nd smallest = 2; hi = ceil(0.8*10)=8th = 8
    assert(got.map(_.getLong(0)).toSeq == (2L to 8L))
    assert(got.head.getAs[Int]("lo_tok") == 2 && got.head.getAs[Int]("hi_tok") == 8)
  }

  test("packManifest: slices per doc rebuild the doc; full bins carry exactly contextLen tokens") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = (1L to 97L).map(i => (i, ((i * 7) % 13 + 1).toInt))
      .toDF("doc_id", "n")
    val m = Packing.packManifest(docs, "doc_id", col("n"), contextLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per doc: slice lengths sum to the doc's token count
    val perDoc = m.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum)
    (1L to 97L).foreach { i =>
      assert(perDoc(i) == (i * 7) % 13 + 1, s"doc $i")
    }
    // per bin except the last: assembled slices fill the context exactly
    val total = (1L to 97L).map(i => (i * 7) % 13 + 1).sum
    val perBin = m.groupBy(_._1).view.mapValues(_.map(s => s._4 - s._3).sum)
    val lastBin = (total - 1) / 10
    perBin.foreach { case (bin, tokens) =>
      if (bin < lastBin) assert(tokens == 10, s"bin $bin has $tokens tokens")
    }
    assert(perBin(lastBin) == total - lastBin * 10)
  }

  test("exportShards: on-disk layout partitioned by shard, content round-trips") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Sampling.exportShards(docs, "doc_id", nShards = 4, path = out,
      maxRecordsPerFile = 20)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.nonEmpty && dirs.forall(d => d.drop(6).toInt < 4))
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // every row landed in the shard its id hashes to
    val mismatches = back.join(
        Sampling.shardAssign(docs, "doc_id", 4)
          .withColumnRenamed("shard", "expected_shard"),
        Seq("doc_id"))
      .filter(org.apache.spark.sql.functions.col("shard") =!=
        org.apache.spark.sql.functions.col("expected_shard"))
      .count()
    assert(mismatches == 0)
  }

  test("tokenize: dense ids in count-desc order, OOV maps to 0, round-trips") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "b b b a a c rare")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabIds(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    // counts: b=3, a=2, c=1, rare=1; top-3 by (n desc, token) = b, a, c
    assert(vocab == Map("b" -> 1, "a" -> 2, "c" -> 3))
    val got = TextAnalysis.tokenize(docs, "doc_id", "text",
        TextAnalysis.vocabIds(docs, "text", 3))
      .orderBy("pos").collect().map(_.getInt(2)).toSeq
    assert(got == Seq(1, 1, 1, 2, 2, 3, 0))
  }

  test("oovRate: per-group basis points, empty tokens excluded, full-coverage group at 0") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "b b b a"),        // fully in-vocab under top-2 {b, a}
      (2L, "s2", "b  x y z"),       // double space -> empty token excluded
      (3L, "s2", "a a"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.oovRate(docs, "source", "text",
        TextAnalysis.vocabIds(docs, "text", 2))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // vocab: b=4, a=3 -> {b, a}. s1: 4 tokens 0 oov; s2: b,x,y,z,a,a =
    // 6 tokens (the empty token from the double space never counts),
    // 3 oov -> 5000 bp
    assert(got.toSeq == Seq(("s1", 4L, 0L, 0L), ("s2", 6L, 3L, 5000L)))
  }

  test("shardStats: shards partition the corpus; totals add up; deterministic") {
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val stats = Sampling.shardStats(docs, "doc_id", "text", nShards = 8)
      .orderBy("shard").collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val again = Sampling.shardStats(docs, "doc_id", "text", nShards = 8)
      .orderBy("shard").collect()
    assert(stats.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("lengthBatches: batches bounded and length-homogeneous; normalizeText canonicalizes") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.{Packing, TextAnalysis}
    val docs = (0L until 100L).map(i => (i, ("w " * (5 + (i % 40).toInt)).trim))
      .toDF("doc_id", "text")
    val out = Packing.lengthBatches(docs, "doc_id", "text",
        bucketTok = 8, batchSize = 4)
      .collect()
    assert(out.length == 100)
    // every (bucket, batch) holds at most batchSize docs; positions dense
    val groups = out.groupBy(r => (r.getInt(2), r.getInt(3)))
    assert(groups.values.forall(_.length <= 4))
    for ((_, g) <- groups)
      assert(g.map(_.getInt(4)).sorted.toSeq == (0 until g.length).toSeq)
    // homogeneous: same bucket => token counts within bucketTok of each other
    for ((b, rows) <- out.groupBy(_.getInt(2))) {
      val lens = rows.map(_.getInt(1))
      assert(lens.max - lens.min < 8, s"bucket $b spans ${lens.min}..${lens.max}")
    }

    val norm = Seq((1L, "  Hello   WORLD \t x "), (2L, "hello world x"))
      .toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.md5(
        TextAnalysis.normalizeText(org.apache.spark.sql.functions.col("text")))
        .as("fp"))
      .collect().map(_.getString(0))
    assert(norm(0) == norm(1), "reformatted copies must share the normalized fingerprint")
  }

  test("mixPlan: budget slices floor-divide, scarcity caps and flags, zero-weight stays") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // srcA: 3 docs x 4 tokens = 12 avail; srcB: 1 doc x 4 = 4; srcC unweighted
    val docs = Seq(
      (1L, "srcA", "w w w w"), (2L, "srcA", "w w w w"), (3L, "srcA", "w w w w"),
      (4L, "srcB", "w w w w"),
      (5L, "srcC", "w w w w"))
      .toDF("doc_id", "source", "text")
    // weights 3:1, budget 16 -> srcA target 12 (fits exactly), srcB target 4
    val plan = Sampling.mixPlan(docs, "source", "text",
        Map("srcA" -> 3L, "srcB" -> 1L), budgetTokens = 16L)
      .orderBy("source").collect()
    val a = plan(0); val b = plan(1); val c = plan(2)
    assert(a.getAs[Long]("target_tok") == 12L && a.getAs[Long]("plan_tok") == 12L &&
      a.getAs[Long]("sample_bp") == 10000L && a.getAs[Boolean]("fillable"))
    assert(b.getAs[Long]("target_tok") == 4L && b.getAs[Boolean]("fillable"))
    assert(c.getAs[Long]("weight") == 0L && c.getAs[Long]("plan_tok") == 0L &&
      c.getAs[Long]("sample_bp") == 0L)

    // budget beyond availability: target 24 > avail 12 -> capped + flagged
    val scarce = Sampling.mixPlan(docs, "source", "text",
        Map("srcA" -> 3L, "srcB" -> 1L), budgetTokens = 32L)
      .orderBy("source").collect()
    assert(scarce(0).getAs[Long]("target_tok") == 24L &&
      scarce(0).getAs[Long]("plan_tok") == 12L &&
      !scarce(0).getAs[Boolean]("fillable"))
    // half-fillable source: target 8 of 4 avail -> 10000 bp cap holds
    assert(scarce(1).getAs[Long]("plan_tok") == 4L &&
      scarce(1).getAs[Long]("sample_bp") == 10000L)
  }

  test("upsampledMixPlan/epochExpand: whole epochs + hash-sampled partial pass") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // srcA: 2 docs x 4 tokens = 8 avail; srcB: 4 docs x 4 = 16 avail
    val docs = ((1L to 2L).map(i => (i, "srcA", "w w w w")) ++
      (3L to 6L).map(i => (i, "srcB", "w w w w")))
      .toDF("doc_id", "source", "text")
    // weights 3:1, budget 40 -> srcA target 30 of 8 avail = 3 epochs +
    // rem 6/8 (7500 bp); srcB target 10 of 16 = 0 epochs + 6250 bp
    val plan = Sampling.upsampledMixPlan(docs, "source", "text",
      Map("srcA" -> 3L, "srcB" -> 1L), budgetTokens = 40L)
    val rows = plan.orderBy("source").collect()
    assert(rows(0).getAs[Long]("target_tok") == 30L &&
      rows(0).getAs[Long]("full_epochs") == 3L &&
      rows(0).getAs[Long]("rem_bp") == 7500L)
    assert(rows(1).getAs[Long]("full_epochs") == 0L &&
      rows(1).getAs[Long]("rem_bp") == 6250L)

    val out = Sampling.epochExpand(docs, "doc_id", "source", plan)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every srcA doc appears in epochs 0..2; epoch 3 holds the hash-
    // sampled partial pass; srcB docs appear at most once (epoch 0)
    val byDoc = out.groupBy(_._1)
    (1L to 2L).foreach { d =>
      val epochs = byDoc.getOrElse(d, Array.empty).map(_._3).sorted.toSeq
      assert(epochs.take(3) == Seq(0L, 1L, 2L) && epochs.size <= 4,
        s"doc $d epochs $epochs")
    }
    (3L to 6L).foreach { d =>
      assert(byDoc.getOrElse(d, Array.empty).forall(_._3 == 0L))
    }
    // the partial pass is the SAME deterministic hash family as the
    // one-epoch mix: srcA's epoch-3 members == the 7500bp hash selection
    val partial = out.filter(r => r._2 == "srcA" && r._3 == 3L).map(_._1).toSet
    val expected = (1L to 2L).filter { d =>
      docs.filter(col("doc_id") === d)
        .select(Sampling.hashBucket(col("doc_id")) < 7500).head().getBoolean(0)
    }.toSet
    assert(partial == expected, s"partial pass $partial != hash selection $expected")
    // token accounting: total emitted tokens lands within one doc of target
    val emitted = out.count(_._2 == "srcA") * 4
    assert(emitted >= 30 - 4 && emitted <= 30 + 4, s"srcA tokens $emitted")
  }

  test("approx corpus profile: HLL++ bound flags green, exact fields exact (sf0.01)") {
    // the query now gates ITSELF (r12: |hll - exact| <= 3*rsd*exact emitted
    // as integer flags, DuckDB-mirrored); this spec re-checks the flags and
    // that the pass-through fields really are exact
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val row = SparkEntry.queries("q_corpus_stats_approx")(spark, dir)
      .collect()(0)
    assert(row.getAs[Int]("sources_ok") == 1)
    assert(row.getAs[Int]("vocab_ok") == 1)
    val d = graft.Tables.documents(spark, dir)
    assert(row.getAs[Long]("n_docs") == d.count())
  }

  test("capPerGroup: bounds each group, survivors stable when losers leave") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, if (i <= 15) "hot" else "cold"))
      .toDF("doc_id", "source")
    val kept = Sampling.capPerGroup(df, "doc_id", "source", maxPerGroup = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "hot") == 5)
    assert(kept.count(_._2 == "cold") == 5) // under cap -> untouched
    // removing non-survivors must not change who survives
    val survivorIds = kept.filter(_._2 == "hot").map(_._1).toSet
    val shrunk = df.filter(col("source") === "cold" ||
      col("doc_id").isin(survivorIds.toSeq: _*))
    val kept2 = Sampling.capPerGroup(shrunk, "doc_id", "source", maxPerGroup = 5)
      .filter(col("source") === "hot")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == survivorIds)
  }

  test("qualityBuckets: per-group deciles, integer key, deterministic ties") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // group A: 4 docs with distinct stopword densities -> ntile(2) splits 2/2
    val df = Seq(
      (1L, "A", "the of and in"),        // 4/4 stopwords -> key 10000
      (2L, "A", "the of cat dog"),       // 2/4 -> 5000
      (3L, "A", "the cat dog fish"),     // 1/4 -> 2500
      (4L, "A", "cat dog fish bird"),    // 0/4 -> 0
      (5L, "B", "the the the the"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.qualityBuckets(df, "doc_id", "text", "source",
        nBuckets = 2)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("q_key"),
        r.getAs[Long]("q_bucket"))).toMap
    assert(got(1L) == (10000L, 1L) && got(2L) == (5000L, 1L))
    assert(got(3L) == (2500L, 2L) && got(4L) == (0L, 2L))
    assert(got(5L)._2 == 1L) // singleton group fills bucket 1
  }
}

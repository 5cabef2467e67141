package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ConnectorConfig, ConnectorWorkbook}
import graft.sources.ConnectorConfig._
import graft.multimodal.Multimodal

class ConnectorAndMultimodalSpec extends AnyFunSuite {

  test("dHash: brightness-invariant, structure-sensitive, size-robust") {
    import java.awt.image.BufferedImage
    def mk(w: Int, h: Int)(g: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // horizontal ramp, kept in [0,200] so a +20 shift cannot wrap
    val ramp = mk(32, 16)((x, _) => x * 6)
    val brighter = mk(32, 16)((x, _) => x * 6 + 20)
    val vramp = mk(32, 16)((_, y) => y * 12) // vertical ramp: no h-gradient
    val big = mk(64, 32)((x, _) => x * 3)    // same ramp, double size
    val h0 = Multimodal.ImageDecoder.dHash(ramp)
    // global brightness shift preserves every gradient sign
    assert(Multimodal.ImageDecoder.dHash(brighter) == h0)
    // the same structure at a different resolution reduces to the same grid
    assert(Multimodal.ImageDecoder.dHash(big) == h0)
    // a structurally different image must not collide
    assert(Multimodal.ImageDecoder.dHash(vramp) != h0)
    // all-increasing ramp sets every bit; vertical ramp sets none
    assert(Multimodal.ImageDecoder.dHash(vramp) == 0L)
  }

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val common = Common(
    name = "demo", kafkaEndpoint = "SASL_SSL://pkc-1234.us-west1.gcp.confluent.cloud:9092",
    kafkaRegion = "us-west1", topicsDir = "topics")

  test("key normalization ports the dirty-key table and dot-space collapse") {
    // improvement over the reference: the dirty-key map is consulted on the
    // raw trimmed key too, so pre-collapse entries like "gcs. bucket name"
    // actually remap (in the reference they were unreachable dead entries)
    assert(normalizeKey(" gcs. bucket name ") == "gcs.bucket.name")
    assert(normalizeKey("gcs credentials.json") == "gcs.credentials.json")
    assert(normalizeKey("tasks-max") == "tasks.max")
    assert(normalizeKey("input data format") == "input.data.format")
    assert(normalizeKey("cloud . provider") == "cloud.provider")
    assert(normalizeKey("already.clean") == "already.clean")
  }

  test("boolish coercion matches reference truthy/falsey sets") {
    assert(coerceBoolish("Y") == "true" && coerceBoolish("1") == "true")
    assert(coerceBoolish("no") == "false" && coerceBoolish("F") == "false")
    assert(coerceBoolish("whatever") == "whatever")
    val n = ConnectorConfig.normalize(Map("errors.log.enable" -> "yes", "x" -> " v "))
    assert(n("errors.log.enable") == "true" && n("x") == "v")
  }

  test("common validation: endpoint format enforced") {
    val bad = common.copy(kafkaEndpoint = "pkc:9093")
    assert(bad.validate.exists(_.msg.contains("kafka.endpoint")))
    assert(common.validate.isEmpty)
  }

  test("source requires topics or topic-regex.list") {
    val src = FileSource(common, bucket = "b", inputFormat = "JSON", outputFormat = "AVRO")
    assert(src.validate.exists(_.msg.contains("Provide either")))
    assert(src.copy(topics = Some("t1")).validate.isEmpty)
    assert(src.copy(topicRegexList = Some(".*")).validate.isEmpty)
  }

  test("sink validation: mask consistency, positive ints, intervals, tz") {
    val sink = FileSink(common, bucket = "b", topics = "t", inputFormat = "AVRO",
      outputFormat = "PARQUET")
    assert(sink.validate.isEmpty)
    assert(sink.copy(maskFields = Some("SSN")).validate
      .exists(_.msg.contains("MaskField type")))
    assert(sink.copy(maskFields = Some("SSN"),
      maskFieldType = Some("org.apache.kafka.connect.transforms.MaskField$Value"))
      .validate.isEmpty)
    assert(sink.copy(flushSize = Some(0)).validate.exists(_.msg.contains("flush.size")))
    assert(sink.copy(timeInterval = Some("WEEKLY")).validate
      .exists(_.msg.contains("time.interval")))
    assert(sink.copy(timezone = Some("Not/AZone")).validate
      .exists(_.msg.contains("Invalid timezone")))
    assert(sink.copy(timezone = Some("America/New_York")).validate.isEmpty)
  }

  test("renders connect-style config and engine writer plan") {
    val sink = FileSink(common, bucket = "gs://b", topics = "t1,t2",
      inputFormat = "AVRO", outputFormat = "PARQUET",
      timeInterval = Some("HOURLY"), compression = Some("gz"),
      flushSize = Some(100000L))
    val cfg = sink.renderConfig
    assert(cfg("connector.class") == "GcsSink")
    assert(cfg("flush.size") == "100000")
    val json = ConnectorConfig.toJson(cfg)
    assert(json.contains("\"gcs.bucket.name\": \"gs://b\""))
    val (fmt, opts, parts) = sink.sparkWriterPlan
    assert(fmt == "parquet")
    assert(opts("compression") == "gzip")
    assert(parts == Seq("year", "month", "day", "hour"))
    val (sfmt, sopts) = FileSource(common, "gs://b", "STRING", "JSON",
      topics = Some("t")).sparkReaderOptions
    assert(sfmt == "text" && sopts("path") == "gs://b")
  }

  test("sensitive keys split out of the main config") {
    val (plain, secret) = splitSensitive(Map(
      "name" -> "x", "kafka.api.key" -> "K", "gcs.credentials.json" -> "{}"))
    assert(plain.keySet == Set("name"))
    assert(secret.keySet == Set("kafka.api.key", "gcs.credentials.json"))
  }

  test("kafka wiring builds source options and keyed sink projection") {
    import graft.sources.KafkaWiring
    val opts = KafkaWiring.sourceOptions(
      "SASL_SSL://pkc-1234.us-west1.gcp.confluent.cloud:9092", Some("t1,t2"), None)
    assert(opts("kafka.bootstrap.servers") == "pkc-1234.us-west1.gcp.confluent.cloud:9092")
    assert(opts("subscribe") == "t1,t2")
    assert(!opts.contains("subscribePattern"))
    val patternOpts = KafkaWiring.sourceOptions("PLAINTEXT://b:9092", None, Some("topic-.*"))
    assert(patternOpts("subscribePattern") == "topic-.*")

    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val (projected, sinkOpts) = KafkaWiring.writePlan(df, "SASL_SSL://b:9092", "out", Some("id"))
    assert(sinkOpts("topic") == "out")
    assert(projected.columns.toSeq == Seq("key", "value"))
    val row = projected.orderBy("key").collect()(0)
    assert(row.getString(0) == "1")
    assert(row.getString(1).contains("\"name\":\"a\""))
  }

  test("multimodal: sniffing real formats, stub features deterministic") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 64, 0, 0, 0, 32) // width=64 height=32
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    assert(Multimodal.sniffFormat(png) == "png")
    assert(Multimodal.pngDims(png).contains((64, 32)))
    assert(Multimodal.sniffFormat(jpeg) == "jpeg")
    assert(Multimodal.sniffFormat("hello".getBytes) == "unknown")

    val df = Seq((1L, png), (2L, jpeg)).toDF("id", "payload")
    val meta = Multimodal.withMetadata(df, "payload").orderBy("id").collect()
    assert(meta(0).getAs[String]("mm_format") == "png")
    assert(meta(0).getAs[Int]("mm_bytes") == png.length)

    val feats = Multimodal.extractFeatures(df, "payload", "id", dim = 8)
    assert(feats.schema.fieldNames.toSeq == Seq("id", "embedding"))
    val twice = Multimodal.extractFeatures(df, "payload", "id", dim = 8)
    val a = feats.orderBy("id").collect().map(_.getSeq[Float](1))
    val b = twice.orderBy("id").collect().map(_.getSeq[Float](1))
    assert(a.zip(b).forall { case (x, y) => x == y }) // deterministic stub
    assert(a(0).length == 8)

    val frames = Multimodal.sampleFrames(df, "payload", "id", everyN = 5, maxFrames = 3)
    assert(frames.count() == 6) // 2 rows x 3 frames
    assert(frames.schema.fieldNames.toSeq == Seq("id", "frame_index", "frame"))
  }

  test("connector workbook: template xlsx renders the reference sample configs byte-for-byte") {
    val tpl = "/root/reference/templates/gcs_connectors_template.xlsx"
    val out = ConnectorWorkbook.generate(tpl) match {
      case Left(errs) => fail(s"workbook validation errors: ${errs.mkString("; ")}")
      case Right(cfgs) => cfgs.toMap
    }
    // golden: the reference ships the JSON it generates from this exact
    // template — the ingested rows must reproduce both files byte-for-byte
    // (key ORDER included, since the reference emits dict insertion order)
    for (name <- Seq("GcsSinkConnector_sample", "GcsSourceConnector_sample")) {
      val expected = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/templates/$name.config.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(out(name) == expected, s"$name config JSON differs from the golden file")
    }
    // the same rows bridge onto the typed engine models cleanly (deep
    // validation + Spark reader/writer mapping)
    val rows = ConnectorWorkbook.loadRows(tpl)
    assert(rows.map(_.connectorType).sorted == Seq("sink", "source"))
    val src = rows.find(_.connectorType == "source").map(ConnectorWorkbook.toFileSource).get
    assert(src.validate.isEmpty && src.sparkReaderOptions._1 == "text")
    val snk = rows.find(_.connectorType == "sink").map(ConnectorWorkbook.toFileSink).get
    assert(snk.validate.isEmpty &&
      snk.sparkWriterPlan._3 == Seq("year", "month", "day", "hour"))
    // a missing required field is reported with the reference's message
    val broken = ConnectorWorkbook.ConnectorRow(
      rows.find(_.connectorType == "sink").get.fields.filterNot(_._1 == "topics"))
    assert(ConnectorWorkbook.validateRow(broken)
      .contains("[sink] Missing required field: topics"))
  }

  test("multimodal: REAL mp4 box-tree parsing — metadata roundtrip, corrupt tolerance") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mp4 = Multimodal.encodeMp4Meta(timescale = 90000, duration = 1234567L)
    assert(Multimodal.sniffFormat(mp4) == "mp4")
    assert(Multimodal.mp4Meta(mp4).contains((90000, 1234567L)))
    // non-mp4 and truncated payloads degrade to None, never throw
    assert(Multimodal.mp4Meta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(mp4.take(20)).isEmpty)
    // a corrupted box size (would walk past the buffer) is rejected
    val bad = mp4.clone(); bad(mp4.length - 4) = 0x7f.toByte
    assert(Multimodal.mp4Meta(bad).isEmpty ||
      Multimodal.mp4Meta(bad).contains((90000, 1234567L)))

    val df = Seq((7L, mp4), (8L, "junk".getBytes)).toDF("id", "payload")
    val rows = Multimodal.videoMeta(df, "payload", "id").orderBy("id").collect()
    assert(rows(0).getInt(1) == 90000 && rows(0).getLong(2) == 1234567L)
    assert(math.abs(rows(0).getDouble(3) - 1234567.0 / 90000) < 1e-12)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }

  test("multimodal: REAL audio PCM decode via javax.sound — roundtrip, stats, features") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // known samples: full-range endpoints + asymmetry so any byte-order or
    // sign mistake in the decoder changes the values
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12345, -1, 256)
    val wav = Multimodal.AudioDecoder.encodeWav(samples, 8000f)
    assert(Multimodal.sniffFormat(wav) == "wav")
    // roundtrip through the real JDK codec reproduces every sample exactly
    val pcm = Multimodal.AudioDecoder.decode(wav).get
    assert(pcm.sampleRate == 8000f && pcm.channels == 1)
    assert(pcm.samples.toSeq == samples.toSeq)
    // stats: exact integer |amplitude| accumulation, single division
    val (n, sr, mean) = Multimodal.AudioDecoder.stats(pcm)
    val expectedMean = samples.map(s => math.abs(s.toInt).toLong).sum /
      (32768.0 * samples.length)
    assert(n == samples.length && sr == 8000 && mean == expectedMean)

    // DataFrame surface: real rows decode, junk rows degrade to null
    val df = Seq((1L, wav), (2L, "not audio".getBytes)).toDF("id", "payload")
    val stats = Multimodal.audioStats(df, "payload", "id").orderBy("id").collect()
    assert(stats(0).getLong(1) == samples.length && stats(0).getInt(2) == 8000)
    assert(stats(1).isNullAt(1) && stats(1).isNullAt(3))
    // feature extraction routes wav through the REAL PCM path: a silent
    // signal must produce all-zero features (the hash-seeded stub cannot)
    val silent = Multimodal.AudioDecoder.encodeWav(Array.fill[Short](64)(0), 8000f)
    val feats = Multimodal.extractFeatures(
        Seq((1L, silent)).toDF("id", "payload"), "payload", "id", dim = 4)
      .head().getSeq[Float](1)
    assert(feats.forall(_ == 0f), s"stub leaked into wav path: $feats")
  }

  test("audio envelopeHash: volume-invariant, structure-sensitive, short-stream zero") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // rising envelope: |amplitude| grows along the clip
    val rising = Array.tabulate[Short](340)(i => (i * 30).toShort)
    val pcmOf = (s: Array[Short]) =>
      Multimodal.AudioDecoder.decode(Multimodal.AudioDecoder.encodeWav(s, 8000f)).get
    val h0 = Multimodal.AudioDecoder.envelopeHash(pcmOf(rising)).get
    // monotone rising envelope sets every comparison bit (16 ones)
    assert(h0 == (1L << 16) - 1, s"rising envelope hash $h0")
    // volume scaling (half gain) preserves every energy comparison
    val quiet = rising.map(s => (s / 2).toShort)
    assert(Multimodal.AudioDecoder.envelopeHash(pcmOf(quiet)).contains(h0))
    // different structure (falling envelope) flips the bits
    val falling = rising.reverse
    assert(Multimodal.AudioDecoder.envelopeHash(pcmOf(falling)).contains(0L))
    // resampling robustness: same shape at half the samples, same hash
    val risingHalf = Array.tabulate[Short](170)(i => (i * 60).toShort)
    assert(Multimodal.AudioDecoder.envelopeHash(pcmOf(risingHalf)).contains(h0))
    // below nBuckets samples there is no stable envelope — None, NOT a
    // 0L sentinel that would merge short clips with legitimately hash-0
    // audio (e.g. the falling envelope above) into one dedup family
    assert(Multimodal.AudioDecoder.envelopeHash(pcmOf(rising.take(16))).isEmpty)

    // DataFrame surface: dup family groups on the hash, junk decodes null
    val df = Seq((1L, Multimodal.AudioDecoder.encodeWav(rising, 8000f)),
        (2L, Multimodal.AudioDecoder.encodeWav(quiet, 8000f)),
        (3L, "junk".getBytes))
      .toDF("id", "payload")
    val rows = Multimodal.audioEnvelopeHash(df, "payload", "id")
      .orderBy("id").collect()
    assert(rows(0).getLong(1) == h0 && rows(1).getLong(1) == h0)
    assert(rows(2).isNullAt(1))
  }

  test("multimodal: REAL pixel decode via ImageIO — stats, grid features, resize") {
    spark.sparkContext.setLogLevel("ERROR")
    import java.awt.image.BufferedImage
    import spark.implicits._

    // 8x8 mid-gray PNG: every pixel (128,128,128) -> luminance 128/255
    def flat(rgb: Int, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    val grayPng = Multimodal.ImageDecoder.encodePng(flat(0x808080, 8, 8))
    // left half black, right half white -> mean luminance 0.5 * (255/255)
    val half = flat(0x000000, 8, 8)
    for (y <- 0 until 8; x <- 4 until 8) half.setRGB(x, y, 0xffffff)
    val halfPng = Multimodal.ImageDecoder.encodePng(half)
    assert(Multimodal.sniffFormat(grayPng) == "png")

    val df = Seq((1L, grayPng), (2L, halfPng), (3L, "not an image".getBytes))
      .toDF("id", "payload")

    // real pixel statistics
    val stats = Multimodal.imageStats(df, "payload", "id").orderBy("id").collect()
    assert(stats(0).getInt(1) == 8 && stats(0).getInt(2) == 8)
    assert(math.abs(stats(0).getDouble(3) - 128.0 / 255.0) < 1e-9)
    assert(math.abs(stats(1).getDouble(3) - 0.5 * 255.0 / 255.0) < 1e-2)
    assert(stats(2).isNullAt(1) && stats(2).isNullAt(3)) // non-image -> null

    // real grid features: gray image -> every cell = 128/255; half image ->
    // left cells ~0, right cells ~1 (2x2 grid from dim=4)
    val feats = Multimodal.extractFeatures(df, "payload", "id", dim = 4)
      .orderBy("id").collect().map(_.getSeq[Float](1))
    assert(feats(0).forall(f => math.abs(f - 128.0f / 255.0f) < 1e-6))
    assert(feats(1)(0) < 0.01f && feats(1)(1) > 0.99f) // [b, w, b, w] cells
    assert(feats(1)(2) < 0.01f && feats(1)(3) > 0.99f)

    // real resize: 8x8 -> 4x4, re-encoded PNG carries the new dims
    val resized = Multimodal.resizeImages(df, "payload", "id", 4, 4)
      .orderBy("id").collect()
    val rb = resized(0).getAs[Array[Byte]]("resized")
    assert(Multimodal.pngDims(rb).contains((4, 4)))
    val rimg = Multimodal.ImageDecoder.decode(rb).get
    assert(math.abs(Multimodal.ImageDecoder.stats(rimg)._3 - 128.0 / 255.0) < 1e-2)
    assert(resized(2).isNullAt(1)) // non-decodable passes through as null
  }

  test("multimodal: REAL AVI frame decode — DIB bit-exact, MJPEG, sampling, tolerance") {
    spark.sparkContext.setLogLevel("ERROR")
    import java.awt.image.BufferedImage
    import spark.implicits._

    def grad(seed: Int, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var p = 0
      for (y <- 0 until h; x <- 0 until w) {
        val g = (seed + p) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g); p += 1
      }
      img
    }
    val frames = (0 until 3).map(f => grad(f * 37 + 5, 8, 8))

    // uncompressed DIB: the RIFF walk + JDK BMP codec round trip is bit-exact
    val avi = Multimodal.AviCodec.encodeAvi(frames, fps = 5)
    assert(Multimodal.sniffFormat(avi) == "avi")
    val (w, h, fps, dec) = Multimodal.AviCodec.decodeFrames(avi).get
    assert(w == 8 && h == 8 && fps == 5 && dec.length == 3)
    for (f <- 0 until 3; y <- 0 until 8; x <- 0 until 8)
      assert((dec(f).getRGB(x, y) & 0xffffff) == (frames(f).getRGB(x, y) & 0xffffff),
        s"pixel mismatch at frame $f ($x,$y)")

    // MJPEG: each frame is a real JPEG stream through the JDK JPEG codec —
    // dims/count exact, pixel values lossy-close
    val mjpeg = Multimodal.AviCodec.encodeAvi(frames, fps = 5, mjpeg = true)
    val (mw, mh, _, mdec) = Multimodal.AviCodec.decodeFrames(mjpeg).get
    assert(mw == 8 && mh == 8 && mdec.length == 3)
    for (f <- 0 until 3) {
      val want = Multimodal.ImageDecoder.stats(frames(f))._3
      val got = Multimodal.ImageDecoder.stats(mdec(f))._3
      assert(math.abs(want - got) < 0.05, s"MJPEG frame $f luminance drifted")
    }

    // distributed frame stats match the synthetic fixture's closed form
    val docs = Seq(5L, 300L).toDF("doc_id")
    val withAvi = Multimodal.withSyntheticAvi(docs, "doc_id")
    val st = Multimodal.videoFrameStats(withAvi, "avi", "doc_id")
      .orderBy("doc_id", "frame_index").collect()
    assert(st.length == 8) // 2 docs x 4 frames
    for (r <- st) {
      val id = r.getLong(0); val fi = r.getInt(1)
      val want = (0 until 64).map(p => (id + 17 * fi + p) % 256).sum / (255.0 * 64)
      assert(r.getInt(2) == 8 && r.getInt(3) == 8)
      assert(math.abs(r.getDouble(4) - want) < 1e-12,
        s"doc $id frame $fi mean luminance off closed form")
    }

    // sampleFrames takes the REAL path for avi: PNG-encoded decoded frames
    val sf = Multimodal.sampleFrames(withAvi, "avi", "doc_id",
        everyN = 2, maxFrames = 2)
      .orderBy("doc_id", "frame_index").collect()
    assert(sf.length == 4) // frames 0 and 2 per doc
    assert(sf.map(_.getInt(1)).toSeq == Seq(0, 2, 0, 2))
    for (r <- sf) {
      val payload = r.getAs[Array[Byte]]("frame")
      assert(Multimodal.sniffFormat(payload) == "png")
      assert(Multimodal.pngDims(payload).contains((8, 8)))
    }

    // tolerance: corrupt/non-avi payloads decode to None, produce no rows
    assert(Multimodal.AviCodec.decodeFrames(null).isEmpty)
    assert(Multimodal.AviCodec.decodeFrames("RIFF1234AVI corrupt".getBytes).isEmpty)
    assert(Multimodal.AviCodec.decodeFrames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("videoFrameDHash: container-independent fingerprint (AVI == GIF of the same frames)") {
    spark.sparkContext.setLogLevel("ERROR")
    import java.awt.image.BufferedImage
    import spark.implicits._
    // gray frames on the GIF's own 256-gray palette so BOTH containers
    // round-trip losslessly — the fingerprint must then be identical
    def grayFrame(seed: Int): BufferedImage = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_INDEXED,
        Multimodal.GifCodec.grayPalette)
      var p = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = (seed + 3 * p) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g); p += 1
      }
      img
    }
    val frames = (0 until 3).map(f => grayFrame(f * 41 + 7))
    val avi = Multimodal.AviCodec.encodeAvi(frames, fps = 5)
    val gif = Multimodal.GifCodec.encodeAnimatedGif(frames, delayCs = 10)
    val df = Seq((1L, avi), (2L, gif), (3L, "junk".getBytes))
      .toDF("id", "payload")
    val rows = Multimodal.videoFrameDHash(df, "payload", "id")
      .orderBy("id", "frame_index").collect()
    assert(rows.length == 6, "junk payload must emit no rows")
    val aviSeq = rows.filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getLong(2))).toSeq
    val gifSeq = rows.filter(_.getLong(0) == 2L).map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(aviSeq == gifSeq, s"container changed the fingerprint: $aviSeq vs $gifSeq")
    // the per-frame hashes match the direct in-memory dHash of the frames
    assert(aviSeq == frames.indices.map(f =>
      (f, Multimodal.ImageDecoder.dHash(frames(f)))))
  }

  test("multimodal: REAL animated-GIF decode — lossless indexed round trip, frame sampling") {
    spark.sparkContext.setLogLevel("ERROR")
    import java.awt.image.BufferedImage
    import spark.implicits._

    def grayFrame(seed: Int): BufferedImage = {
      val img = new BufferedImage(8, 8,
        BufferedImage.TYPE_BYTE_INDEXED, Multimodal.GifCodec.grayPalette)
      var p = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        img.getRaster.setSample(x, y, 0, (seed + p) % 256); p += 1
      }
      img
    }
    val frames = (0 until 3).map(f => grayFrame(f * 41 + 7))
    val gif = Multimodal.GifCodec.encodeAnimatedGif(frames)
    assert(Multimodal.sniffFormat(gif) == "gif")

    // sequence read returns every frame, pixel-exact (fixed palette)
    val dec = Multimodal.GifCodec.decodeFrames(gif).get
    assert(dec.length == 3)
    for (f <- 0 until 3; y <- 0 until 8; x <- 0 until 8)
      assert((dec(f).getRGB(x, y) & 0xffffff) == (frames(f).getRGB(x, y) & 0xffffff),
        s"GIF pixel mismatch at frame $f ($x,$y)")

    // a still PNG-style single-frame gif decodes to exactly one frame
    val still = Multimodal.GifCodec.encodeAnimatedGif(frames.take(1))
    assert(Multimodal.GifCodec.decodeFrames(still).get.length == 1)

    // distributed frame stats + real-path sampling over the synthetic fixture
    val docs = Seq(9L, 260L).toDF("doc_id")
    val withGif = Multimodal.withSyntheticGif(docs, "doc_id")
    val st = Multimodal.videoFrameStats(withGif, "gif", "doc_id")
      .orderBy("doc_id", "frame_index").collect()
    assert(st.length == 8)
    for (r <- st) {
      val id = r.getLong(0); val fi = r.getInt(1)
      val want = (0 until 64).map(p => (id + 11 * fi + p) % 256).sum / (255.0 * 64)
      assert(math.abs(r.getDouble(4) - want) < 1e-12,
        s"doc $id frame $fi mean luminance off closed form")
    }
    val sf = Multimodal.sampleFrames(withGif, "gif", "doc_id", everyN = 3, maxFrames = 2)
      .orderBy("doc_id", "frame_index").collect()
    assert(sf.map(_.getInt(1)).toSeq == Seq(0, 3, 0, 3))
    assert(sf.forall(r => Multimodal.sniffFormat(r.getAs[Array[Byte]]("frame")) == "png"))

    // tolerance
    assert(Multimodal.GifCodec.decodeFrames(null).isEmpty)
    assert(Multimodal.GifCodec.decodeFrames("GIF89a garbage".getBytes).isEmpty)
  }
}

package graft.sources

import scala.util.matching.Regex

/** Declarative file-source / file-sink connector configs — the reference's
  * GCS connector spec surface (scripts/gcs_config_generator.py:40-210,
  * sttm2flink-ui-5_4/connector_config/models.py:8-59) re-expressed as
  * validated Scala models that render to (a) the Kafka-Connect-style JSON
  * the reference emits and (b) Spark reader/writer options (the engine's
  * actual execution path: `readStream.format(fmt).load(bucket)` /
  * `writeStream.partitionBy(...)`).
  */
object ConnectorConfig {

  /** Sloppy-Excel key normalization: collapse spaces around dots, collapse
    * runs of spaces, then apply the observed dirty-key table (the reference
    * ports real-world keys seen in resources/gcs-source-connector.json). */
  val normalizeMap: Map[String, String] = Map(
    "cloud provider" -> "cloud.provider",
    "cloud. environment" -> "cloud.environment",
    "connector. class" -> "connector.class",
    "gcs. bucket.name" -> "gcs.bucket.name",
    "gcs. bucket name" -> "gcs.bucket.name",
    "gcs credentials.json" -> "gcs.credentials.json",
    "input data format" -> "input.data.format",
    "output data. format" -> "output.data.format",
    "output data.format" -> "output.data.format",
    "input.data. format" -> "input.data.format",
    "tasks-max" -> "tasks.max",
    "topic-regex. list" -> "topic-regex.list",
    "value. converter. decimal. format" -> "value.converter.decimal.format")

  def normalizeKey(key: String): String = {
    val trimmed = key.trim
    // Divergence (improvement) from the reference: it consults the dirty-key
    // map only AFTER collapsing spaces around dots, which makes its own map
    // entries containing ". " unreachable (e.g. "gcs. bucket name" was never
    // remapped). We check the raw trimmed key first, then the collapsed one.
    normalizeMap.get(trimmed).getOrElse {
      var k = trimmed.replaceAll("\\s*\\.\\s*", ".")
      k = k.replaceAll("\\s{2,}", " ")
      normalizeMap.getOrElse(k, k)
    }
  }

  /** Boolean coercion for the boolish keys (yes/y/1 -> "true" etc.). */
  val boolishKeys: Set[String] = Set(
    "errors.log.enable",
    "errors.deadletterqueue.context.headers.enable",
    "value.converter.replace.null.with.default")

  def coerceBoolish(v: String): String = v.trim.toLowerCase match {
    case "true" | "t" | "yes" | "y" | "1" => "true"
    case "false" | "f" | "no" | "n" | "0" => "false"
    case _ => v
  }

  val sensitiveKeys: Set[String] = Set(
    "gcs.credentials.config", "gcs.credentials.json",
    "basic.auth.user.info", "sasl.jaas.config",
    "kafka.api.key", "kafka.api.secret")

  /** Split a config map into (non-sensitive, sensitive) halves. */
  def splitSensitive(cfg: Map[String, String]): (Map[String, String], Map[String, String]) =
    cfg.partition { case (k, _) => !sensitiveKeys.contains(k) }

  val allowedFormats: Set[String] = Set("JSON", "AVRO", "PARQUET", "CSV", "STRING")
  val allowedIntervals: Set[String] = Set("MINUTE", "HOURLY", "DAILY")
  private val endpointRe: Regex = """.+://.+:9092""".r

  sealed trait Issue { def msg: String }
  final case class Invalid(msg: String) extends Issue

  /** Common connector fields (CommonRow). */
  final case class Common(
      name: String,
      kafkaEndpoint: String,
      kafkaRegion: String,
      topicsDir: String,
      tasksMax: Int = 1,
      status: String = "PAUSED") {
    def validate: Seq[Issue] = {
      val b = Seq.newBuilder[Issue]
      if (name.trim.isEmpty) b += Invalid("name is required")
      if (!endpointRe.matches(kafkaEndpoint))
        b += Invalid("kafka.endpoint should include scheme (e.g., SASL_SSL://) and end with :9092")
      if (kafkaRegion.trim.isEmpty) b += Invalid("kafka.region is required")
      if (topicsDir.trim.isEmpty) b += Invalid("topics.dir is required")
      if (!Set("RUNNING", "PAUSED").contains(status)) b += Invalid(s"invalid status: $status")
      if (tasksMax <= 0) b += Invalid("tasks.max must be positive")
      b.result()
    }
  }

  /** File-bucket source -> stream (SourceExtras). */
  final case class FileSource(
      common: Common,
      bucket: String,
      inputFormat: String,
      outputFormat: String,
      topics: Option[String] = None,
      topicRegexList: Option[String] = None,
      filePattern: Option[String] = None,
      pollIntervalMs: Option[Long] = Some(60000L)) {

    def validate: Seq[Issue] = {
      val b = Seq.newBuilder[Issue]
      b ++= common.validate
      if (bucket.trim.isEmpty) b += Invalid("gcs.bucket.name is required")
      if (!allowedFormats.contains(inputFormat))
        b += Invalid(s"invalid input.data.format: $inputFormat")
      if (!allowedFormats.contains(outputFormat))
        b += Invalid(s"invalid output.data.format: $outputFormat")
      if (topics.forall(_.trim.isEmpty) && topicRegexList.forall(_.trim.isEmpty))
        b += Invalid("Provide either 'topics' or 'topic-regex.list'")
      if (pollIntervalMs.exists(_ <= 0)) b += Invalid("poll.interval.ms must be positive")
      b.result()
    }

    /** Kafka-Connect-style JSON config (renderers.py:18-34 shape). */
    def renderConfig: Map[String, String] = Map(
      "connector.class" -> "GcsSource",
      "name" -> common.name,
      "tasks.max" -> common.tasksMax.toString,
      "kafka.endpoint" -> common.kafkaEndpoint,
      "kafka.region" -> common.kafkaRegion,
      "topics.dir" -> common.topicsDir,
      "gcs.bucket.name" -> bucket,
      "input.data.format" -> inputFormat,
      "output.data.format" -> outputFormat) ++
      topics.map("topics" -> _) ++
      topicRegexList.map("topic-regex.list" -> _) ++
      filePattern.map("input.file.pattern" -> _) ++
      pollIntervalMs.map("poll.interval.ms" -> _.toString)

    /** The engine execution mapping: Spark streaming-reader options
      * (S2 — `readStream.format(fmt).options(...)` over the bucket path). */
    def sparkReaderOptions: (String, Map[String, String]) = {
      val fmt = inputFormat.toLowerCase match {
        case "string" => "text"
        case other => other
      }
      val opts = Map("path" -> bucket) ++
        filePattern.map("pathGlobFilter" -> _) ++
        pollIntervalMs.map(ms => "maxFilesPerTrigger" -> "1000") // poll cadence ≈ trigger interval
      (fmt, opts)
    }
  }

  /** Stream -> file-bucket sink (SinkExtras). */
  final case class FileSink(
      common: Common,
      bucket: String,
      topics: String,
      inputFormat: String,
      outputFormat: String,
      timeInterval: Option[String] = None,
      timezone: Option[String] = None,
      maskFields: Option[String] = None,
      maskFieldType: Option[String] = None,
      flushSize: Option[Long] = None,
      rotateIntervalMs: Option[Long] = None,
      timePartitionDurationMs: Option[Long] = None,
      timePathFormat: Option[String] = None,
      compression: Option[String] = None,
      errorsTolerance: Option[String] = None) {

    def validate: Seq[Issue] = {
      val b = Seq.newBuilder[Issue]
      b ++= common.validate
      if (bucket.trim.isEmpty) b += Invalid("gcs.bucket.name is required")
      if (topics.trim.isEmpty) b += Invalid("topics is required")
      Seq("input" -> inputFormat, "output" -> outputFormat).foreach { case (w, f) =>
        if (!allowedFormats.contains(f)) b += Invalid(s"invalid $w.data.format: $f")
      }
      timeInterval.foreach(t =>
        if (!allowedIntervals.contains(t)) b += Invalid(s"invalid time.interval: $t"))
      timezone.filter(_.nonEmpty).foreach { tz =>
        if (scala.util.Try(java.time.ZoneId.of(tz)).isFailure)
          b += Invalid(s"Invalid timezone: $tz")
      }
      if (maskFields.exists(_.nonEmpty) && maskFieldType.forall(t => !t.contains("$")))
        b += Invalid("MaskField type should look like org.apache.kafka.connect.transforms.MaskField$Value")
      Seq("flush.size" -> flushSize, "rotate.interval.ms" -> rotateIntervalMs,
        "time.partition.duration.ms" -> timePartitionDurationMs).foreach {
        case (k, Some(v)) if v <= 0 => b += Invalid(s"$k must be a positive integer")
        case _ =>
      }
      compression.foreach(c =>
        if (!Set("none", "gz", "snappy").contains(c)) b += Invalid(s"invalid compression: $c"))
      errorsTolerance.foreach(e =>
        if (!Set("none", "all").contains(e)) b += Invalid(s"invalid errors.tolerance: $e"))
      b.result()
    }

    def renderConfig: Map[String, String] = Map(
      "connector.class" -> "GcsSink",
      "name" -> common.name,
      "tasks.max" -> common.tasksMax.toString,
      "kafka.endpoint" -> common.kafkaEndpoint,
      "kafka.region" -> common.kafkaRegion,
      "topics.dir" -> common.topicsDir,
      "topics" -> topics,
      "gcs.bucket.name" -> bucket,
      "input.data.format" -> inputFormat,
      "output.data.format" -> outputFormat) ++
      timeInterval.map("time.interval" -> _) ++
      timezone.map("timezone" -> _) ++
      maskFields.map("transforms.MaskField.fields" -> _) ++
      maskFieldType.map("transforms.MaskField.type" -> _) ++
      flushSize.map("flush.size" -> _.toString) ++
      rotateIntervalMs.map("rotate.interval.ms" -> _.toString) ++
      timePartitionDurationMs.map("time.partition.duration.ms" -> _.toString) ++
      timePathFormat.map("time.path.format" -> _) ++
      compression.map("compression" -> _) ++
      errorsTolerance.map("errors.tolerance" -> _)

    /** Engine execution mapping (S3): writer format/options + the derived
      * time-partition columns (year/month/day[/hour]) for `partitionBy`. */
    def sparkWriterPlan: (String, Map[String, String], Seq[String]) = {
      val fmt = outputFormat.toLowerCase match {
        case "string" => "text"
        case other => other
      }
      val partitions = timeInterval match {
        case Some("DAILY") => Seq("year", "month", "day")
        case Some("HOURLY") => Seq("year", "month", "day", "hour")
        case Some("MINUTE") => Seq("year", "month", "day", "hour", "minute")
        case _ => Nil
      }
      val opts = Map("path" -> bucket) ++
        compression.filter(_ != "none").map {
          case "gz" => "compression" -> "gzip"
          case c => "compression" -> c
        }
      (fmt, opts, partitions)
    }
  }

  /** Parse a raw (possibly sloppy) key/value sheet into a normalized,
    * boolean-coerced config map. */
  def normalize(raw: Map[String, String]): Map[String, String] =
    raw.map { case (k, v) =>
      val nk = normalizeKey(k)
      nk -> (if (boolishKeys.contains(nk)) coerceBoolish(v) else v.trim)
    }

  /** Minimal JSON render of a config map (stable key order). */
  def toJson(cfg: Map[String, String]): String =
    cfg.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${escape(k)}": "${escape(v)}""""
    }.mkString("{\n  ", ",\n  ", "\n}")

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

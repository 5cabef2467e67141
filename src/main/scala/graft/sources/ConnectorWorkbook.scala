package graft.sources

import graft.spec.SttmParser

/** Excel-workbook ingestion for connector configs — the reference's
  * load_excel_frames / build_rows / validate_row / assemble_config /
  * write_json pipeline (scripts/gcs_config_generator.py:216-322) over the
  * Common / GCS_Sink / GCS_Source sheets of
  * templates/gcs_connectors_template.xlsx.
  *
  * KEY ORDER IS SIGNIFICANT: the reference assembles each connector as a
  * Python dict — Common-sheet columns first (empty cells skipped), then the
  * matching type sheet's extras, then `setdefault` fallbacks — and
  * `json.dump(indent=2)`s it, so the emitted JSON's key order is the
  * insertion order. [[renderJson]] reproduces that byte-for-byte (verified
  * against the reference's shipped sample configs in
  * ConnectorAndMultimodalSpec). [[toFileSource]]/[[toFileSink]] bridge the
  * ingested rows onto the typed [[ConnectorConfig]] models, which carry the
  * deep validation and the engine's actual Spark reader/writer mapping.
  */
object ConnectorWorkbook {

  /** A connector row as ordered (normalizedKey -> trimmedValue) pairs. */
  type OrderedRow = Vector[(String, String)]

  final case class ConnectorRow(fields: OrderedRow) {
    def get(k: String): Option[String] = fields.find(_._1 == k).map(_._2)
    def connectorType: String = get("connector_type").getOrElse("")
    def name: String = get("name").getOrElse("")
  }

  /** Normalize a raw sheet row: sloppy-key normalization, trim, drop empty
    * cells (build_rows' `if str(v).strip() != ""`). */
  private def normRow(row: Seq[(String, String)]): OrderedRow =
    row.iterator
      .map { case (k, v) => ConnectorConfig.normalizeKey(k) -> v.trim }
      .filter(_._2.nonEmpty)
      .toVector

  /** Python `{**a, **b}`: keys keep their FIRST-occurrence position, a
    * duplicated key takes b's value. */
  private def merge(a: OrderedRow, b: OrderedRow): OrderedRow = {
    val bMap = b.toMap
    val aKeys = a.map(_._1).toSet
    a.map { case (k, v) => k -> bMap.getOrElse(k, v) } ++
      b.filterNot { case (k, _) => aKeys.contains(k) }
  }

  private def setDefault(row: OrderedRow, k: String, v: String): OrderedRow =
    if (row.exists(_._1 == k)) row else row :+ (k -> v)

  /** build_rows: one combined row per Common-sheet connector — Common
    * fields, the first matching (by name) type-sheet row's extras, boolish
    * coercion, then the reference's setdefault chain. */
  def buildRows(common: Seq[Seq[(String, String)]],
                sink: Seq[Seq[(String, String)]],
                source: Seq[Seq[(String, String)]]): Seq[ConnectorRow] =
    common.flatMap { c =>
      val connector = normRow(c)
      val ctype = connector.collectFirst { case ("connector_type", v) => v }.getOrElse("")
      val name = connector.collectFirst { case ("name", v) => v }.getOrElse("")
      if (ctype.isEmpty || name.isEmpty) None
      else {
        val pool = if (ctype == "sink") sink else source
        val extra = pool.map(normRow)
          .find(_.contains("name" -> name))
          .getOrElse(Vector.empty)
        val coerced = merge(connector, extra).map { case (k, v) =>
          k -> (if (ConnectorConfig.boolishKeys.contains(k))
                  ConnectorConfig.coerceBoolish(v)
                else v)
        }
        val withDefaults = Seq(
          "cloud.provider" -> "gcp",
          "kafka.auth.mode" -> "SERVICE_ACCOUNT",
          "connector.class" -> (if (ctype == "sink") "GcsSink" else "GcsSource"),
          "tasks.max" -> (if (ctype == "sink") "1" else "5"),
          "status" -> "PAUSED"
        ).foldLeft(coerced) { case (row, (k, v)) => setDefault(row, k, v) }
        Some(ConnectorRow(withDefaults))
      }
    }

  /** validate_row: required-field checks with the reference's messages. */
  def validateRow(row: ConnectorRow): Seq[String] = {
    val b = Seq.newBuilder[String]
    val baseReq = Seq("name", "cloud.environment", "kafka.endpoint", "kafka.region",
      "kafka.service.account.id", "topics.dir", "tasks.max")
    baseReq.foreach { k =>
      if (row.get(k).forall(_.isEmpty)) b += s"Missing required field: $k"
    }
    row.connectorType match {
      case "sink" =>
        Seq("topics", "gcs.bucket.name", "input.data.format", "output.data.format")
          .foreach { k =>
            if (row.get(k).forall(_.isEmpty)) b += s"[sink] Missing required field: $k"
          }
      case "source" =>
        if (row.get("topic-regex.list").forall(_.isEmpty) &&
            row.get("topics").forall(_.isEmpty))
          b += "[source] Provide either 'topic-regex.list' or 'topics'"
        Seq("gcs.bucket.name", "input.data.format", "output.data.format")
          .foreach { k =>
            if (row.get(k).forall(_.isEmpty)) b += s"[source] Missing required field: $k"
          }
      case _ => b += "connector_type must be 'sink' or 'source'"
    }
    b.result()
  }

  /** assemble_config: drop the control keys, keep insertion order. */
  def assembleConfig(row: ConnectorRow): OrderedRow =
    row.fields.filterNot { case (k, _) => k == "connector_type" || k == "status" }

  /** Python json.dump(cfg, indent=2, ensure_ascii=False) + "\n",
    * insertion-ordered keys — byte-identical to the reference's
    * write_json output for all-string configs. */
  def renderJson(cfg: OrderedRow): String =
    cfg.map { case (k, v) => s"""  "${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Load a workbook's connector rows (Common joined with its type sheets). */
  def loadRows(path: String): Seq[ConnectorRow] =
    buildRows(
      SttmParser.xlsxSheetRecordsOrdered(path, "Common"),
      SttmParser.xlsxSheetRecordsOrdered(path, "GCS_Sink"),
      SttmParser.xlsxSheetRecordsOrdered(path, "GCS_Source"))

  /** generate_configs: load, validate every row, and either return all
    * validation errors (reference exits 1) or the (name, configJson)
    * pairs the reference writes as <name>.config.json files. */
  def generate(path: String): Either[Seq[String], Seq[(String, String)]] = {
    val rows = loadRows(path)
    val errs = rows.flatMap { r =>
      (validateRow(r) ++ modelIssues(r)).map(m => s"[${r.name}] $m")
    }
    if (errs.nonEmpty) Left(errs)
    else Right(rows.map(r => r.name -> renderJson(assembleConfig(r))))
  }

  /** Deep validation via the typed models (the pydantic layer's twin). */
  def modelIssues(row: ConnectorRow): Seq[String] = row.connectorType match {
    case "sink" => toFileSink(row).validate.map(_.msg)
    case "source" => toFileSource(row).validate.map(_.msg)
    case _ => Nil
  }

  private def common(row: ConnectorRow): ConnectorConfig.Common =
    ConnectorConfig.Common(
      name = row.name,
      kafkaEndpoint = row.get("kafka.endpoint").getOrElse(""),
      kafkaRegion = row.get("kafka.region").getOrElse(""),
      topicsDir = row.get("topics.dir").getOrElse(""),
      tasksMax = row.get("tasks.max").flatMap(_.toIntOption).getOrElse(1),
      status = row.get("status").getOrElse("PAUSED"))

  /** Bridge to the engine's typed source model (deep validation + the
    * Spark streaming-reader mapping). */
  def toFileSource(row: ConnectorRow): ConnectorConfig.FileSource =
    ConnectorConfig.FileSource(
      common = common(row),
      bucket = row.get("gcs.bucket.name").getOrElse(""),
      inputFormat = row.get("input.data.format").getOrElse(""),
      outputFormat = row.get("output.data.format").getOrElse(""),
      topics = row.get("topics"),
      topicRegexList = row.get("topic-regex.list"),
      filePattern = row.get("file.regex").filter(_.nonEmpty)
        .orElse(row.get("gcs.pattern").filter(_.nonEmpty)),
      pollIntervalMs = row.get("poll.interval.ms").flatMap(_.toLongOption))

  /** Bridge to the engine's typed sink model (deep validation + the Spark
    * writer/partitionBy mapping). */
  def toFileSink(row: ConnectorRow): ConnectorConfig.FileSink =
    ConnectorConfig.FileSink(
      common = common(row),
      bucket = row.get("gcs.bucket.name").getOrElse(""),
      topics = row.get("topics").getOrElse(""),
      inputFormat = row.get("input.data.format").getOrElse(""),
      outputFormat = row.get("output.data.format").getOrElse(""),
      timeInterval = row.get("time.interval"),
      timezone = row.get("timezone"),
      maskFields = row.get("transforms.MaskField.fields"),
      maskFieldType = row.get("transforms.MaskField.type"),
      flushSize = row.get("flush.size").flatMap(_.toLongOption),
      rotateIntervalMs = row.get("rotate.interval.ms").flatMap(_.toLongOption),
      timePartitionDurationMs = row.get("time.partition.duration.ms").flatMap(_.toLongOption),
      timePathFormat = row.get("time.path.format"),
      compression = row.get("compression"),
      errorsTolerance = row.get("errors.tolerance"))
}

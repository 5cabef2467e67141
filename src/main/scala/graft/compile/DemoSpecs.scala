package graft.compile

import scala.io.Source
import graft.spec.{SttmParser, SttmSpec}

/** Bundled demo STTM specs (classpath resources) exercising the full
  * compiler path on the driver-generated testdata. The JSON pipeline mirrors
  * the reference's canonical 3-stage shape (view -> XREF upsert -> FGAC
  * enrichment + quarantine, final-output.sql); the CSV spec exercises
  * SPLIT_INDEX auto-indexing (history-queries.sql).
  */
object DemoSpecs {

  private def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** events/customer JSON pipeline: EVENTS_VW, CUST_VW, XREF_USER,
    * FGAC_USER_REF, QUAR_USER. Payload column is `props`. */
  lazy val jsonPipeline: SttmSpec = SttmSpec(
    SttmParser.mappingFromCsv(resource("/graft/demo_sttm.csv")),
    SttmParser.matrixFromCsv(resource("/graft/demo_matrix.csv")))

  lazy val jsonOptions: CompilerOptions = CompilerOptions(payloadCol = "props")

  /** Delete-flag XREF variant: events kept un-filtered in the view, rows
    * with EVENT_TYPE='error' excluded before the upsert ranking via the
    * graft.delete.flag / graft.delete.values matrix keys (F6). */
  lazy val deleteFlagPipeline: SttmSpec = SttmSpec(
    SttmParser.mappingFromCsv(resource("/graft/demo_sttm_df.csv")),
    SttmParser.matrixFromCsv(
      "Key,EVENTS_ALL_VW,XREF_USER_DF\n" +
        "changelog.mode,,upsert\n" +
        "\"graft.upsert.order\",,\"TS,EVENT_ID\"\n" +
        "graft.delete.flag,,EVENT_TYPE\n" +
        "graft.delete.values,,error\n" +
        "value.format,json,avro-registry\n"))

  /** v21 prefix/suffix variant of the JSON pipeline: emitted names are
    * decorated (view_prefix=V_, table_suffix=_T) and — because the reference
    * decorates ONLY emitted names (sttm_to_flink_v21.py:336) — the sheet's
    * source/join references are authored against the decorated names, the
    * way a v21 BA would write them when a prefix config is in force. */
  lazy val prefixedConfig: Map[String, String] =
    Map("view_prefix" -> "V_", "table_suffix" -> "_T")

  lazy val prefixedJsonPipeline: graft.spec.SttmSpec = {
    val base = jsonPipeline
    val viewTargets = base.rows.filter(_.isView).map(_.targetTable).toSet
    val tableTargets = base.rows.filterNot(_.isView).map(_.targetTable).toSet
    def emit(n: String): String =
      if (viewTargets(n)) "V_" + n
      else if (tableTargets(n)) n + "_T"
      else n // raw source tables stay undecorated
    val rows = base.rows.map(r => r.copy(
      sourcePrimaryTable = emit(r.sourcePrimaryTable),
      joinTable = emit(r.joinTable)))
    graft.spec.SttmSpec(rows, base.matrix, prefixedConfig)
  }

  /** Production-width JSON view (VERDICT r10 #5): 32 JSON-mapped BIGINT
    * columns + a STRING discriminator + an override PK passthrough —
    * real STTM workbooks carry dozens of mapped columns, and the generator
    * emits one JSON_VALUE re-parse per column (sttm_to_flink_v22.py:218-228).
    * This fixture drives the COMPILED spec->SQL->Catalyst path through
    * FuseJsonAccess at width, not a hand-built equivalent: q_sttm_wide's
    * oracle + ViewFusionSpec's one-JsonToStructs plan assertion lock that
    * spec->compile->fuse->execute stays a single parse end-to-end. */
  lazy val wideJsonPipeline: SttmSpec = {
    val header = "PipelineStage,TargetTable,TargetColumn,TargetDataType," +
      "IsTargetPK,TargetPK,MessageFormat,FieldSelector,SourcePrimaryTable," +
      "SourcePrimaryAlias,SourceField,ExprOverride,SourceTransformExpr," +
      "FilterPredicate,JoinTable,JoinAlias,JoinType,JoinCondition,Notes"
    val rows = Seq(
      "View,WIDE_VW,EVENT_ID,BIGINT,Y,EVENT_ID,,,events_wide,e,,event_id,,,,,,,driving id",
      "View,WIDE_VW,TYP,STRING,N,,JSON,,events_wide,e,typ,,,,,,,,type discriminator") ++
      (0 until 32).map(i =>
        s"View,WIDE_VW,F$i,BIGINT,N,,JSON,,events_wide,e,f$i,,,,,,,,payload field $i")
    SttmSpec(
      SttmParser.mappingFromCsv((header +: rows).mkString("\n")),
      SttmParser.matrixFromCsv("Key,WIDE_VW\nvalue.format,json"))
  }

  lazy val wideOptions: CompilerOptions = CompilerOptions(payloadCol = "payload")

  /** CSV view with one explicit positional index and two auto-assigned. */
  lazy val csvPipeline: SttmSpec = SttmSpec(
    SttmParser.mappingFromCsv(resource("/graft/demo_csv_sttm.csv")),
    SttmParser.matrixFromCsv("Key,CSV_VW\nvalue.format,csv"))

  lazy val csvOptions: CompilerOptions =
    CompilerOptions(payloadCol = "val", csvDelimiter = "|")
}

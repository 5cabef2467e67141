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

  /** CSV view with one explicit positional index and two auto-assigned. */
  lazy val csvPipeline: SttmSpec = SttmSpec(
    SttmParser.mappingFromCsv(resource("/graft/demo_csv_sttm.csv")),
    SttmParser.matrixFromCsv("Key,CSV_VW\nvalue.format,csv"))

  lazy val csvOptions: CompilerOptions =
    CompilerOptions(payloadCol = "val", csvDelimiter = "|")
}

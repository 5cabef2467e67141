package graft.compile

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.validate.{SqlValidation, SttmValidation}
import org.apache.spark.sql.SparkSession

/** Artifact bundling (B1/B2): the grouped create/views/inserts files, the
  * consolidated 00_all.sql, YAML blocks, validation CSVs, and a zip bundle —
  * the engine's "export mode" producing the same artifact set the reference
  * ships (sttm2flink/utils.py:28-87; flinksql_from_sttm_v4_5.py:416-422;
  * yaml samples under resources/output/).
  */
object Bundle {

  final case class Artifacts(files: Seq[(String, String)]) {
    def writeTo(dir: String): Unit = {
      files.foreach { case (name, content) =>
        val p = Paths.get(dir, name)
        Files.createDirectories(p.getParent)
        Files.writeString(p, content)
      }
    }

    def toZip: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val zip = new ZipOutputStream(bos, StandardCharsets.UTF_8)
      files.foreach { case (name, content) =>
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes(StandardCharsets.UTF_8))
        zip.closeEntry()
      }
      zip.close()
      bos.toByteArray
    }
  }

  /** YAML block with a single `SQL queries: |` literal (the reference's
    * views.yaml / sinks.yaml / inserts.yaml shape,
    * flinksql_from_sttm_v4_5.py:416-422). */
  def yamlBlock(sql: String): String =
    "SQL queries: |\n" + sql.linesIterator.map(l => s"  $l").mkString("\n") + "\n"

  /** Build the full artifact set for a compiled pipeline. `spark` enables
    * the Catalyst-backed static SQL validation report (V3). */
  def artifacts(p: CompiledPipeline, spark: Option[SparkSession] = None): Artifacts = {
    val creates = p.tables.filter(_.stage != "VIEW").map(_.tableDdl)
    val views = p.views.map(_.viewSql)
    val inserts = (p.xrefs ++ p.fgacs).map(_.insertSql)
    val stmtSet =
      if (inserts.isEmpty) ""
      else "EXECUTE STATEMENT SET\nBEGIN\n  " + inserts.mkString("\n  ") + "\nEND;\n"

    val base = Seq.newBuilder[(String, String)]
    if (creates.nonEmpty) base += "bundle/create.sql" -> (creates.mkString("\n\n") + "\n")
    if (views.nonEmpty) base += "bundle/views.sql" -> (views.mkString("\n\n") + "\n")
    if (stmtSet.nonEmpty) base += "bundle/inserts_statement_set.sql" -> stmtSet
    base += "00_all.sql" -> p.allSql
    if (views.nonEmpty) base += "views.yaml" -> yamlBlock(views.mkString("\n\n"))
    if (creates.nonEmpty) base += "sinks.yaml" -> yamlBlock(creates.mkString("\n\n"))
    if (stmtSet.nonEmpty) base += "inserts.yaml" -> yamlBlock(stmtSet)
    base += "issues_v22.csv" -> SttmValidation.issuesCsv(p.issues)
    spark.foreach { s =>
      val results = SqlValidation.validate(s, p.allSql)
      base += "validation/sql_report.csv" -> SqlValidation.reportCsv(results)
    }
    Artifacts(base.result())
  }
}

package graft.spec

import java.util.zip.ZipFile
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.xml.XML

/** Parsers for the STTM spec: CSV (RFC-4180-ish) and xlsx (zip+XML, no
  * external dependency — sharedStrings + per-sheet cell scan, exactly what
  * the survey validated as feasible offline).
  */
object SttmParser {

  // ---- CSV --------------------------------------------------------------

  /** Minimal quoted-CSV splitter (handles "" escapes and embedded commas /
    * newlines inside quotes). */
  def splitCsv(text: String): Seq[Seq[String]] = {
    val rows = mutable.ArrayBuffer.empty[Seq[String]]
    val field = new StringBuilder
    val row = mutable.ArrayBuffer.empty[String]
    var inQ = false
    var i = 0
    def endField(): Unit = { row += field.result(); field.clear() }
    def endRow(): Unit = { endField(); rows += row.toSeq; row.clear() }
    while (i < text.length) {
      val ch = text.charAt(i)
      if (inQ) {
        if (ch == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQ = false
        } else field += ch
      } else ch match {
        case '"' => inQ = true
        case ',' => endField()
        case '\r' => // swallow (CRLF)
        case '\n' => endRow()
        case c => field += c
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq.filter(_.exists(_.trim.nonEmpty))
  }

  /** Decode raw CSV bytes with encoding detection — the reference runs
    * uploaded CSVs through chardet (sttm2flink-ui-5_4/sttm2flink/
    * generator.py:19-31); we cover the encodings an Excel/Sheets export
    * actually produces: UTF-8 (with or without BOM), UTF-16LE/BE with BOM,
    * BOM-less UTF-16 detected by the NUL-byte stripe ASCII-range CSV text
    * exhibits on every other byte, and plain Excel "CSV" exports (ANSI /
    * windows-1252) — the latter by strict-validating as UTF-8 first and
    * falling back on malformed input, so no byte ever decodes to U+FFFD. */
  def decodeCsvBytes(bytes: Array[Byte]): String = {
    import java.nio.charset.StandardCharsets._
    def b(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 3 && b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF)
      new String(bytes, 3, bytes.length - 3, UTF_8)
    else if (bytes.length >= 2 && b(0) == 0xFF && b(1) == 0xFE)
      new String(bytes, 2, bytes.length - 2, UTF_16LE)
    else if (bytes.length >= 2 && b(0) == 0xFE && b(1) == 0xFF)
      new String(bytes, 2, bytes.length - 2, UTF_16BE)
    else {
      val n = math.min(bytes.length, 512)
      val nulOdd = (1 until n by 2).count(bytes(_) == 0)
      val nulEven = (0 until n by 2).count(bytes(_) == 0)
      if (n >= 4 && nulOdd > n / 4) new String(bytes, UTF_16LE)
      else if (n >= 4 && nulEven > n / 4) new String(bytes, UTF_16BE)
      else decodeUtf8OrCp1252(bytes)
    }
  }

  /** Strict UTF-8 decode; windows-1252 on the first malformed sequence
    * (every byte is defined in cp1252's table modulo the five C1 gaps,
    * which Java maps to the C1 controls — nothing becomes U+FFFD). */
  private def decodeUtf8OrCp1252(bytes: Array[Byte]): String = {
    import java.nio.charset.{CodingErrorAction, StandardCharsets}
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(bytes, java.nio.charset.Charset.forName("windows-1252"))
    }
  }

  /** [[mappingFromCsv]] over raw bytes (encoding-sniffed). */
  def mappingFromCsvBytes(bytes: Array[Byte]): Seq[SttmRow] =
    mappingFromCsv(decodeCsvBytes(bytes))

  /** Parse mapping rows from CSV text with a header row. Header names are
    * trimmed; literal "nan" cells (Excel export artifacts) become empty —
    * mirrors norm_cols (sttm_to_flink_v22.py:28-33). A leading BOM char
    * (callers that decoded UTF-8-BOM bytes themselves) is stripped so the
    * first header cell still matches. */
  def mappingFromCsv(text: String): Seq[SttmRow] = {
    val rows = splitCsv(text.stripPrefix("\uFEFF"))
    if (rows.isEmpty) return Nil
    val header = rows.head.map(_.trim)
    rows.tail.map { cells =>
      val m = header.zipAll(cells, "", "").map { case (h, v) =>
        val t = v.trim
        h -> (if (t.equalsIgnoreCase("nan")) "" else t)
      }.toMap
      SttmRow.fromMap(m)
    }
  }

  /** Parse a Config_TableMatrix CSV: first column Key (any case), remaining
    * columns are table names. */
  def matrixFromCsv(text: String): TableMatrix = {
    val rows = splitCsv(text)
    if (rows.isEmpty) return TableMatrix.empty
    val header = rows.head.map(_.trim)
    val keyIdx = header.indexWhere(_.equalsIgnoreCase("key"))
    if (keyIdx < 0) return TableMatrix.empty
    val tableCols = header.zipWithIndex.filter { case (h, i) => i != keyIdx && h.nonEmpty }
    TableMatrix(rows.tail.flatMap { cells =>
      val key = cells.lift(keyIdx).getOrElse("").trim
      if (key.isEmpty) None
      else Some(key -> tableCols.map { case (h, i) =>
        h -> cells.lift(i).getOrElse("").trim
      }.toMap)
    })
  }

  /** Parse a v21-style Config sheet CSV: `key,value` columns (any case,
    * extra columns ignored). Mirrors cfg_get (sttm_to_flink_v21.py:35-43):
    * literal "nan" AND empty values are dropped (so a blank cell falls back
    * to the caller's default, like `or "val"` does in the reference), and a
    * duplicated key keeps its FIRST row (`m['value'].iloc[0]`). */
  def configFromCsv(text: String): Map[String, String] = {
    val rows = splitCsv(text)
    if (rows.isEmpty) return Map.empty
    val header = rows.head.map(_.trim)
    val keyIdx = header.indexWhere(_.equalsIgnoreCase("key"))
    val valIdx = header.indexWhere(_.equalsIgnoreCase("value"))
    if (keyIdx < 0 || valIdx < 0) return Map.empty
    firstWins(rows.tail.flatMap { cells =>
      val k = cells.lift(keyIdx).getOrElse("").trim
      val v = cells.lift(valIdx).getOrElse("").trim
      if (k.isEmpty || v.isEmpty || v.equalsIgnoreCase("nan")) None
      else Some(k -> v)
    })
  }

  /** First occurrence of each key wins (reference takes `.iloc[0]`). */
  private def firstWins(pairs: Seq[(String, String)]): Map[String, String] =
    pairs.foldLeft(Map.empty[String, String]) { case (acc, (k, v)) =>
      if (acc.contains(k)) acc else acc + (k -> v)
    }

  // ---- xlsx -------------------------------------------------------------

  /** Read one sheet of an xlsx as rows of (columnLetter -> cellString). */
  private def readXlsxSheet(zip: ZipFile, sheetPath: String,
                            shared: IndexedSeq[String]): Seq[Map[String, String]] = {
    val entry = Option(zip.getEntry(sheetPath)).getOrElse(return Nil)
    val xml = XML.load(zip.getInputStream(entry))
    (xml \\ "row").map { row =>
      (row \ "c").flatMap { c =>
        val ref = (c \ "@r").text
        val colLetter = ref.takeWhile(_.isLetter)
        val t = (c \ "@t").text
        val raw = (c \ "v").text
        val value = t match {
          case "s" => shared.lift(raw.toIntOption.getOrElse(-1)).getOrElse("")
          case "inlineStr" => (c \ "is" \ "t").text
          case _ => raw
        }
        if (colLetter.isEmpty) None else Some(colLetter -> value)
      }.toMap
    }
  }

  private def colOrder(c: String): Int =
    c.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1))

  /** Sheet rows -> header-keyed maps using the first row as header. */
  private def toRecords(rows: Seq[Map[String, String]]): Seq[Map[String, String]] =
    rows match {
      case head +: tail =>
        val header = head.toSeq.sortBy(p => colOrder(p._1))
        tail.map { r =>
          header.map { case (letter, name) =>
            name.trim -> r.getOrElse(letter, "").trim
          }.toMap
        }
      case _ => Nil
    }

  /** Read one sheet of an xlsx workbook as ORDERED records: each data row
    * as (headerName, cellValue) pairs in sheet column order, first row as
    * header. Missing sheet or workbook -> Nil. Column order is preserved
    * because some consumers (the connector workbook, which mirrors the
    * reference's pandas-roundtrip JSON emission) are order-significant. */
  def xlsxSheetRecordsOrdered(path: String, sheet: String): Seq[Seq[(String, String)]] = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] = Option(zip.getEntry("xl/sharedStrings.xml")) match {
        case Some(e) =>
          val xml = XML.load(zip.getInputStream(e))
          (xml \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }
      val wb = XML.load(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
      val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
      val relTargets: Map[String, String] =
        Option(zip.getEntry("xl/_rels/workbook.xml.rels")).map { e =>
          (XML.load(zip.getInputStream(e)) \\ "Relationship").map { r =>
            val target = (r \ "@Target").text
            (r \ "@Id").text ->
              (if (target.startsWith("/")) target.drop(1) else s"xl/$target")
          }.toMap
        }.getOrElse(Map.empty)
      val path0 = (wb \\ "sheet").zipWithIndex.collectFirst {
        case (s, idx) if (s \ "@name").text == sheet =>
          relTargets.get(s.attribute(relNs, "id").map(_.text).getOrElse(""))
            .getOrElse(s"xl/worksheets/sheet${idx + 1}.xml")
      }
      path0.filter(p => zip.getEntry(p) != null).map { p =>
        readXlsxSheet(zip, p, shared) match {
          case head +: tail =>
            val header = head.toSeq.sortBy(x => colOrder(x._1))
            tail.map { r =>
              header.map { case (letter, name) =>
                name.trim -> r.getOrElse(letter, "").trim
              }
            }
          case _ => Nil
        }
      }.getOrElse(Nil)
    } finally zip.close()
  }

  /** Load an STTM workbook (.xlsx): STTM_Mapping (or STTM, or first sheet)
    * plus Config_TableMatrix if present. */
  def fromXlsx(path: String): SttmSpec = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] = Option(zip.getEntry("xl/sharedStrings.xml")) match {
        case Some(e) =>
          val xml = XML.load(zip.getInputStream(e))
          (xml \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }
      val wb = XML.load(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
      val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
      // resolve each sheet's r:id through the workbook rels part — sheetN.xml
      // numbering does NOT follow workbook order after deletes/reorders
      val relTargets: Map[String, String] =
        Option(zip.getEntry("xl/_rels/workbook.xml.rels")).map { e =>
          (XML.load(zip.getInputStream(e)) \\ "Relationship").map { r =>
            val target = (r \ "@Target").text
            (r \ "@Id").text ->
              (if (target.startsWith("/")) target.drop(1) else s"xl/$target")
          }.toMap
        }.getOrElse(Map.empty)
      val sheets: Seq[(String, Option[String])] = (wb \\ "sheet").zipWithIndex.map {
        case (s, idx) =>
          val name = (s \ "@name").text
          val rid = s.attribute(relNs, "id").map(_.text).getOrElse("")
          val path = relTargets.get(rid)
            .orElse(Some(s"xl/worksheets/sheet${idx + 1}.xml")) // legacy fallback
          name -> path
      }
      val sheetNames = sheets.map(_._1)
      def sheetPath(name: String): Option[String] =
        sheets.find(_._1 == name).flatMap(_._2)
          .filter(p => zip.getEntry(p) != null)
      val mappingSheet = Seq("STTM_Mapping", "STTM").find(sheetNames.contains)
        .orElse(sheetNames.headOption)
      val mappingRows = mappingSheet.flatMap(sheetPath).map { p =>
        toRecords(readXlsxSheet(zip, p, shared)).map { m =>
          SttmRow.fromMap(m.map { case (k, v) =>
            k -> (if (v.equalsIgnoreCase("nan")) "" else v)
          })
        }
      }.getOrElse(Nil)
      val matrix = sheetPath("Config_TableMatrix").map { p =>
        val recs = readXlsxSheet(zip, p, shared)
        recs match {
          case head +: tail =>
            val header = head.toSeq.sortBy(x => colOrder(x._1))
            val keyLetter = header.find(_._2.trim.equalsIgnoreCase("key")).map(_._1)
            keyLetter match {
              case None => TableMatrix.empty
              case Some(kl) =>
                val tableCols = header.filter { case (l, n) => l != kl && n.trim.nonEmpty }
                TableMatrix(tail.flatMap { r =>
                  val key = r.getOrElse(kl, "").trim
                  if (key.isEmpty) None
                  else Some(key -> tableCols.map { case (l, n) =>
                    n.trim -> r.getOrElse(l, "").trim
                  }.toMap)
                })
            }
          case _ => TableMatrix.empty
        }
      }.getOrElse(TableMatrix.empty)
      // v21 Config sheet (key/value): prefix/suffix + generator settings.
      // Same semantics as configFromCsv: empty/"nan" dropped, first
      // occurrence of a duplicate key wins (cfg_get's .iloc[0]).
      val config = sheetPath("Config").map { p =>
        firstWins(toRecords(readXlsxSheet(zip, p, shared)).flatMap { m =>
          val k = m.find(_._1.equalsIgnoreCase("key")).map(_._2.trim).getOrElse("")
          val v = m.find(_._1.equalsIgnoreCase("value")).map(_._2.trim).getOrElse("")
          if (k.isEmpty || v.isEmpty || v.equalsIgnoreCase("nan")) None
          else Some(k -> v)
        })
      }.getOrElse(Map.empty[String, String])
      SttmSpec(mappingRows.filter(r => r.targetTable.nonEmpty || r.targetColumn.nonEmpty),
        matrix, config)
    } finally zip.close()
  }
}

package graft.exprs

import graft.spec.SttmRow
import scala.util.matching.Regex

/** Expression compiler: STTM row -> scalar SQL expression text.
  *
  * The emitted dialect keeps the reference's Flink function names
  * (JSON_VALUE, SPLIT_INDEX, ...) so specs and golden outputs stay
  * byte-comparable; [[graft.functions.FlinkCompat]] registers those names in
  * the Spark session as native expression builders, so the text executes
  * verbatim through Catalyst with zero interpretation overhead.
  *
  * Semantics ported (with truth-table tests mirroring the reference's):
  *  - precedence ExprOverride > SourceTransformExpr > auto(format)
  *    with view auto-CAST (sttm_to_flink_v22.py:116-157)
  *  - JSON path building incl. bracket escape (v22:54-67)
  *  - CSV auto index assignment with reservations (v22:326-351)
  *  - predicate sanitize / bare-token JSON rewrite (v22:69-112)
  */
object ExprCompiler {

  val SqlReserved: Set[String] = Set(
    "LIKE", "AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "EXISTS", "ALL",
    "ANY", "SOME", "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "ON",
    "AS", "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "GROUP", "BY",
    "ORDER", "HAVING", "DISTINCT", "ASC", "DESC", "LIMIT", "OFFSET")

  private val simpleField: Regex = """^[A-Za-z_][A-Za-z0-9_]*$""".r
  private val intRe: Regex = """^\d+$""".r
  private val castPrefix: Regex = """(?is)^\s*CAST\s*\(.*""".r

  /** Build a safe JSON path: keep `$...` as-is, dot-path for simple field
    * names, bracket notation (with `"` escape) otherwise. */
  def jsonPath(selector: String, fallback: String = ""): String = {
    val candidate = Seq(selector, fallback).map(Option(_).getOrElse("").trim)
      .find(_.nonEmpty).getOrElse("")
    if (candidate.isEmpty) "$"
    else if (candidate.startsWith("$")) candidate
    else if (simpleField.matches(candidate)) s"$$.$candidate"
    else s"""$$["${candidate.replace("\"", "\\\"")}"]"""
  }

  /** Strip a leading WHERE/AND/OR and trailing semicolons (no token
    * rewriting — safe for XREF/FGAC predicates). */
  def sanitizePredicate(raw: String): String = {
    var s = Option(raw).getOrElse("").trim
    s = s.replaceAll("(?i)^\\s*(WHERE|AND|OR)\\b", "").trim
    s.replaceAll(";+\\s*$", "")
  }

  private def rewriteToken(token: String, payloadCol: String): String =
    if (SqlReserved.contains(token) || token.forall(_.isDigit) ||
        (!token.contains('_') && token.length <= 3)) token
    else s"JSON_VALUE(CAST($payloadCol AS STRING), '$$.$token')"

  private def isWordChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** VIEW filters only: rewrite bare UPPERCASE field-like tokens to
    * JSON_VALUE lookups, leaving quoted strings intact; idempotent when
    * JSON_VALUE already appears.
    *
    * Token recognition replicates the reference's `\b[A-Z][A-Z0-9_]*[A-Z0-9]\b`
    * evaluated at position i of the FULL string (Python `re.match(fp, i)`):
    * the left boundary requires the preceding char to be a non-word char
    * (naive substring matching would wrongly fire inside identifiers like
    * `evtTYPE`), and the trailing boundary means a token candidate followed
    * by a word char — or ending in '_' — matches nothing at all (regex
    * backtracking can never satisfy the trailing \b inside the run). */
  def rewritePredicateAsJson(fp: String, payloadCol: String): String = {
    if (fp == null || fp.isEmpty || fp.toUpperCase.contains("JSON_VALUE")) return fp
    val out = new StringBuilder
    var i = 0
    var inS = false
    var inD = false
    while (i < fp.length) {
      val ch = fp.charAt(i)
      if (ch == '\'' && !inD) { out += ch; i += 1; inS = !inS }
      else if (ch == '"' && !inS) { out += ch; i += 1; inD = !inD }
      else if (inS || inD) { out += ch; i += 1 }
      else {
        val leftBoundary = i == 0 || !isWordChar(fp.charAt(i - 1))
        if (leftBoundary && ch >= 'A' && ch <= 'Z') {
          var j = i
          while (j < fp.length && (fp.charAt(j).isUpper && fp.charAt(j) <= 'Z' ||
            fp.charAt(j).isDigit || fp.charAt(j) == '_')) j += 1
          val run = fp.substring(i, j)
          val rightBoundary = j == fp.length || !isWordChar(fp.charAt(j))
          val validToken = run.length >= 2 && rightBoundary &&
            run.last != '_' && (run.last.isDigit || run.last.isUpper)
          if (validToken) {
            out ++= rewriteToken(run, payloadCol)
            i = j
          } else { out += ch; i += 1 }
        } else { out += ch; i += 1 }
      }
    }
    out.result()
  }

  /** CSV auto-index assignment: explicit numeric FieldSelectors reserve their
    * index; rows with blank selectors get the next free index in sheet order;
    * override/transform rows don't consume an index (v22:326-351). */
  def autoCsvIndex(rows: Seq[SttmRow]): Map[String, Int] = {
    def autoEligible(r: SttmRow): Boolean =
      r.messageFormat.trim.equalsIgnoreCase("CSV") &&
        r.exprOverride.trim.isEmpty && r.sourceTransformExpr.trim.isEmpty
    val reserved = scala.collection.mutable.Set.empty[Int]
    rows.foreach { r =>
      if (autoEligible(r) && intRe.matches(r.fieldSelector.trim))
        reserved += r.fieldSelector.trim.toInt
    }
    var cursor = 0
    val out = scala.collection.mutable.Map.empty[String, Int]
    rows.foreach { r =>
      if (autoEligible(r)) {
        val fsel = r.fieldSelector.trim
        if (intRe.matches(fsel)) cursor = math.max(cursor, fsel.toInt + 1)
        else {
          var idx = cursor
          while (reserved.contains(idx)) idx += 1
          out(r.targetColumn) = idx
          reserved += idx
          cursor = idx + 1
        }
      }
    }
    out.toMap
  }

  /** Scalar expression for one mapping row (v22 choose_expr).
    * Views: override/transform (auto-CAST unless already CAST), else
    * format-driven extraction with trim/null normalization + CAST.
    * Non-views: override/transform/sourceField verbatim, else the target
    * column name itself (a pass-through reference), else NULL. */
  def chooseExpr(row: SttmRow, isView: Boolean, payloadCol: String,
                 csvDelim: String, autoIdx: Map[String, Int]): String = {
    val override_ = row.exprOverride.trim
    val stx = row.sourceTransformExpr.trim
    val tgt = row.dataTypeOrDefault

    def castUnlessCast(e: String): String =
      if (castPrefix.matches(e)) e else s"CAST($e AS $tgt)"

    if (isView) {
      if (override_.nonEmpty) return castUnlessCast(override_)
      if (stx.nonEmpty) return castUnlessCast(stx)
      val mf = row.messageFormat.trim.toUpperCase
      val sfld = row.sourceField.trim
      val fsel = row.fieldSelector.trim
      val base = mf match {
        case "JSON" =>
          val key = if (sfld.nonEmpty) sfld else fsel
          val path = jsonPath(key, row.targetColumn).replace("'", "''")
          s"JSON_VALUE(CAST($payloadCol AS STRING), '$path')"
        case "CSV" =>
          val srcp = if (sfld.nonEmpty) sfld else payloadCol
          val idx =
            if (intRe.matches(fsel)) fsel.toInt
            else autoIdx.getOrElse(row.targetColumn, 0)
          s"SPLIT_INDEX(CAST($srcp AS STRING), '$csvDelim', $idx)"
        case _ =>
          if (sfld.nonEmpty) sfld else payloadCol
      }
      val norm =
        if (tgt.toUpperCase.startsWith("STRING")) s"TRIM($base)"
        else s"NULLIF(TRIM($base), '')"
      s"CAST($norm AS $tgt)"
    } else {
      if (override_.nonEmpty) override_
      else if (stx.nonEmpty) stx
      else if (row.sourceField.trim.nonEmpty) row.sourceField.trim
      else if (row.targetColumn.trim.nonEmpty) row.targetColumn.trim
      else "NULL"
    }
  }
}

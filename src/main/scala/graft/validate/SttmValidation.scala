package graft.validate

import graft.spec.{SttmSpec, SttmRow, TableMatrix}
import graft.exprs.ExprCompiler

/** STTM validation rule engine — port of the v22 rule set
  * (sttm_validations_v22.py:77-219): structural checks on the mapping and
  * cross-checks against Config_TableMatrix. Pure Scala, no Spark.
  */
object SttmValidation {

  sealed trait Level { def name: String }
  case object Error extends Level { val name = "ERROR" }
  case object Warn extends Level { val name = "WARN" }
  case object Info extends Level { val name = "INFO" }

  final case class Issue(level: Level, message: String)

  private val intRe = """^\d+$""".r

  /** Stage-agnostic mapping checks (validate_views_and_alignment). */
  def validateMapping(rows: Seq[SttmRow]): Seq[Issue] = {
    val issues = Seq.newBuilder[Issue]
    def err(m: String): Unit = issues += Issue(Error, m)
    def warn(m: String): Unit = issues += Issue(Warn, m)

    if (rows.exists(r => r.targetTable.isEmpty && r.targetColumn.nonEmpty))
      err("Found row with blank TargetTable.")

    val grouped = rows.filter(_.targetTable.nonEmpty).groupBy(_.targetTable)
    grouped.toSeq.sortBy(_._1).foreach { case (tname, trows) =>
      val stage = trows.head.stage
      val tgtCols = trows.map(_.targetColumn).filter(_.nonEmpty)
      if (tgtCols.isEmpty) err(s"[$tname] has no TargetColumn entries.")
      tgtCols.diff(tgtCols.distinct).distinct.foreach { c =>
        err(s"[$tname] duplicate TargetColumn: $c")
      }
      val pkCols = trows.filter(_.isPk).map(_.targetColumn).filter(_.nonEmpty)
      if (pkCols.length != pkCols.distinct.length)
        warn(s"[$tname] duplicate PK marks on: ${pkCols.mkString(", ")}")
      val spts = trows.map(_.sourcePrimaryTable).filter(_.nonEmpty)
      if (spts.isEmpty)
        err(s"[$tname] missing SourcePrimaryTable (at least one row must specify it).")
      else if (stage == "VIEW" && spts.distinct.length > 1)
        warn(s"[$tname] VIEW uses multiple SourcePrimaryTable values: ${spts.distinct.mkString(", ")}")

      if (stage == "VIEW") {
        trows.zipWithIndex.foreach { case (r, i0) =>
          val i = i0 + 1
          val mf = r.messageFormat.trim.toUpperCase
          val hasExpr = r.exprOverride.trim.nonEmpty || r.sourceTransformExpr.trim.nonEmpty
          val key = if (r.sourceField.trim.nonEmpty) r.sourceField.trim else r.fieldSelector.trim
          if (mf.nonEmpty && mf != "JSON" && mf != "CSV")
            err(s"[$tname] row#$i invalid MessageFormat: $mf")
          if (mf == "JSON") {
            if (!hasExpr && key.isEmpty)
              err(s"[$tname] row#$i JSON View missing key (SourceField or FieldSelector).")
            if (key.startsWith("$"))
              err(s"[$tname] row#$i JSON key must not start with '$$'.")
          }
          if (mf == "CSV" && !hasExpr && r.fieldSelector.trim.nonEmpty &&
              !intRe.matches(r.fieldSelector.trim))
            err(s"[$tname] row#$i CSV FieldSelector must be numeric when provided. Got: ${r.fieldSelector.trim}")
        }
        trows.find(r => r.isPk && r.filterPredicate.trim.nonEmpty)
          .map(_.filterPredicate.trim)
          .filter(_.matches("(?is)^\\s*(WHERE|AND|OR)\\b.*"))
          .foreach { _ =>
            warn(s"[$tname] FilterPredicate should be condition only; drop leading WHERE/AND/OR.")
          }
      } else {
        val jts = trows.map(_.joinTable.trim).filter(_.nonEmpty)
        val jcs = trows.map(_.joinCondition.trim).filter(_.nonEmpty)
        if (jts.nonEmpty && jcs.isEmpty)
          warn(s"[$tname] JoinTable specified but JoinCondition missing.")
        if (jcs.nonEmpty && jts.isEmpty)
          err(s"[$tname] JoinCondition provided but JoinTable empty.")
        val preds = trows.map(r => ExprCompiler.sanitizePredicate(r.filterPredicate))
          .filter(_.nonEmpty)
        if (preds.length > 1) {
          val combined = preds.distinct.mkString(" AND ")
          warn(s"[$tname] Multiple FilterPredicate rows found (non-view); combined predicate will be: $combined")
        }
      }
    }
    issues.result()
  }

  /** Matrix cross-checks (validate_against_matrix): presence for every
    * mapping table, XREF_* upsert requirement, unused matrix columns,
    * duplicate keys (last wins). */
  def validateMatrix(rows: Seq[SttmRow], matrix: TableMatrix): Seq[Issue] = {
    val issues = Seq.newBuilder[Issue]
    val mappingTables = rows.map(_.targetTable).filter(_.nonEmpty).distinct.sorted
    if (matrix.rows.isEmpty) {
      issues += Issue(Error, "Config_TableMatrix sheet missing or empty.")
      return issues.result()
    }
    val perTable = matrix.perTable
    mappingTables.foreach { t =>
      val props = perTable.getOrElse(t, Map.empty)
      if (props.isEmpty)
        issues += Issue(Error,
          s"[Config_TableMatrix] Missing per-table properties for mapping TargetTable '$t'.")
      if (t.toUpperCase.startsWith("XREF_")) {
        val cm = props.getOrElse("changelog.mode", "").trim.toLowerCase
        if (cm != "upsert")
          issues += Issue(Error,
            s"[Config_TableMatrix] XREF table '$t' must set changelog.mode=upsert (found '${if (cm.isEmpty) "missing" else cm}').")
      }
    }
    matrix.tables.filterNot(mappingTables.contains).foreach { t =>
      issues += Issue(Warn,
        s"[Config_TableMatrix] Column '$t' not found in mapping TargetTable list (assuming external/pre-existing).")
    }
    matrix.tables.foreach { t =>
      val skip = Set("", "na", "n/a", "none")
      val keys = matrix.rows.collect {
        case (k, vals) if !skip.contains(vals.getOrElse(t, "").trim.toLowerCase) => k
      }
      if (keys.length != keys.distinct.length)
        issues += Issue(Warn,
          s"[Config_TableMatrix] Duplicate keys detected for table column '$t' (last value will win).")
    }
    issues.result()
  }

  def validate(spec: SttmSpec): Seq[Issue] =
    validateMapping(spec.rows) ++ validateMatrix(spec.rows, spec.matrix)

  /** issues_v22.csv-compatible report text. */
  def issuesCsv(issues: Seq[Issue]): String = {
    val rows =
      if (issues.isEmpty) Seq("INFO" -> "No issues found")
      else issues.map(i => i.level.name -> i.message)
    ("level,message" +: rows.map { case (l, m) =>
      val esc = if (m.contains(",") || m.contains("\"")) "\"" + m.replace("\"", "\"\"") + "\"" else m
      s"$l,$esc"
    }).mkString("\n")
  }
}

package graft.spec

/** STTM (Source-To-Target Mapping) spec model — the metadata that drives the
  * whole engine. One [[SttmRow]] per target-column mapping, mirroring the
  * v22 19-column sheet layout (reference: resources/STTM_v22.xlsx sheet
  * STTM_Mapping; header list verified against the workbook).
  *
  * Stage semantics (scripts/sttm_to_flink_v22.py:297): VIEW -> typed
  * projection of a raw payload stream; XREF -> keyed upsert snapshot;
  * FGAC -> refined/enriched table (joins + masking + quarantine arms).
  */
final case class SttmRow(
    pipelineStage: String = "",
    targetTable: String = "",
    targetColumn: String = "",
    targetDataType: String = "",
    isTargetPK: String = "",
    targetPK: String = "",
    messageFormat: String = "",
    fieldSelector: String = "",
    sourcePrimaryTable: String = "",
    sourcePrimaryAlias: String = "",
    sourceField: String = "",
    exprOverride: String = "",
    sourceTransformExpr: String = "",
    filterPredicate: String = "",
    joinTable: String = "",
    joinAlias: String = "",
    joinType: String = "",
    joinCondition: String = "",
    notes: String = "") {
  def stage: String = pipelineStage.trim.toUpperCase
  def isView: Boolean = stage == "VIEW"
  def isPk: Boolean = isTargetPK.trim.equalsIgnoreCase("Y")
  def dataTypeOrDefault: String = {
    val t = targetDataType.trim
    if (t.isEmpty) "STRING" else t
  }
}

object SttmRow {
  /** v22 sheet header order (STTM_v22.xlsx!STTM_Mapping A..S). */
  val headers: Seq[String] = Seq(
    "PipelineStage", "TargetTable", "TargetColumn", "TargetDataType",
    "IsTargetPK", "TargetPK", "MessageFormat", "FieldSelector",
    "SourcePrimaryTable", "SourcePrimaryAlias", "SourceField",
    "ExprOverride", "SourceTransformExpr", "FilterPredicate",
    "JoinTable", "JoinAlias", "JoinType", "JoinCondition", "Notes")

  def fromMap(m: Map[String, String]): SttmRow = {
    def g(k: String) = m.getOrElse(k, "").trim
    SttmRow(
      pipelineStage = g("PipelineStage"), targetTable = g("TargetTable"),
      targetColumn = g("TargetColumn"), targetDataType = g("TargetDataType"),
      isTargetPK = g("IsTargetPK"), targetPK = g("TargetPK"),
      messageFormat = g("MessageFormat"), fieldSelector = g("FieldSelector"),
      sourcePrimaryTable = g("SourcePrimaryTable"),
      sourcePrimaryAlias = g("SourcePrimaryAlias"), sourceField = g("SourceField"),
      exprOverride = g("ExprOverride"),
      sourceTransformExpr = g("SourceTransformExpr"),
      filterPredicate = g("FilterPredicate"), joinTable = g("JoinTable"),
      joinAlias = g("JoinAlias"), joinType = g("JoinType"),
      joinCondition = g("JoinCondition"), notes = g("Notes"))
  }
}

/** Config_TableMatrix: per-table key/value properties (WITH(...) options,
  * engine extensions). Blank / na / n/a / none values are skipped; values
  * may use the `${table_name}` macro (expanded at resolve time); duplicate
  * keys: last write wins (reference warns, keeps last —
  * sttm_validations_v22.py:205-219).
  */
final case class TableMatrix(rows: Seq[(String, Map[String, String])]) {
  /** Table-name columns present in the matrix. */
  val tables: Seq[String] =
    rows.flatMap(_._2.keys).distinct

  private val skip = Set("", "na", "n/a", "none")

  /** Resolved props for a table: logical name preferred, emitted name as
    * fallback; `${table_name}` expanded with the emitted name
    * (sttm_to_flink_v22.py:160-214). Returned as a ListMap in SHEET ROW
    * ORDER (duplicate keys: last value wins, first position kept — exactly
    * a Python dict update), so DDL WITH(...) rendering is byte-stable and
    * matches the reference's insertion-order iteration for any key count —
    * a plain Map switches to HashMap above 4 entries and scrambles order. */
  def propsFor(logical: String, emitted: String): Map[String, String] = {
    val colName =
      if (tables.contains(logical)) Some(logical)
      else if (tables.contains(emitted)) Some(emitted)
      else None
    colName match {
      case None => scala.collection.immutable.ListMap.empty
      case Some(c) =>
        val ordered = rows.foldLeft(Vector.empty[(String, String)]) {
          case (acc, (key, vals)) =>
            val k = key.trim
            val v = vals.getOrElse(c, "").trim
            if (k.isEmpty || skip.contains(v.toLowerCase)) acc
            else {
              val entry = k -> v.replace("${table_name}", emitted)
              val i = acc.indexWhere(_._1 == k)
              if (i >= 0) acc.updated(i, entry) else acc :+ entry
            }
        }
        scala.collection.immutable.ListMap(ordered: _*)
    }
  }

  /** All (key -> value) per table, used by the validator. */
  def perTable: Map[String, Map[String, String]] =
    tables.map(t => t -> propsFor(t, t)).toMap
}

object TableMatrix {
  val empty: TableMatrix = TableMatrix(Nil)
}

/** `config`: flat key/value Config-sheet settings (v21 generator:
  * sttm_to_flink_v21.py:35-56 `cfg_get`) — the v21 surface the engine
  * honors is `view_prefix`/`view_suffix`/`table_prefix`/`table_suffix`
  * (applied to EMITTED names only, `apply_prefix_suffix` at v21:48-56,336;
  * source references stay as authored, exactly like the reference). */
final case class SttmSpec(rows: Seq[SttmRow], matrix: TableMatrix,
                          config: Map[String, String] = Map.empty) {
  /** Stable compile order: stage rank, table, PK-first, column
    * (sttm_to_flink_v22.py:297-303). */
  def sorted: Seq[SttmRow] = {
    val stageRank = Map("VIEW" -> 0, "XREF" -> 1, "FGAC" -> 2)
    rows.sortBy(r => (
      stageRank.getOrElse(r.stage, 99), r.targetTable,
      if (r.isPk) 0 else 1, r.targetColumn))
  }

  /** Rows grouped by target table, preserving the stable sort order. */
  def grouped: Seq[(String, Seq[SttmRow])] = {
    val s = sorted.filter(_.targetTable.nonEmpty)
    s.map(_.targetTable).distinct.map(t => t -> s.filter(_.targetTable == t))
  }
}

package graft.compile

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.FlinkCompat
import graft.spec.SttmParser

/** The v4.5 / UI-generator "column-spec" pipeline format — capabilities the
  * v22 format dropped but the engine must keep (SURVEY §0 "we must cover the
  * union"): lowercase headers, multi-view ordered join chains, UNION-ALL
  * arms per (filter, join) pair, NULL column filler, and per-source-table
  * view emission from a single multi-entity topic.
  *
  * Ported semantics (reference file:line):
  *  - arm grouping by (filter, join_condition|NOJOIN):
  *    flinksql_from_sttm_v4_5.py:187-188, 246-292
  *  - driving view = row with lowest join_order: :206-213
  *  - join block: distinct conditions ordered by (join_order, condition),
  *    right side = first `<name>_vw` reference not yet used: :214-244
  *  - join type normalization LEFT/RIGHT/FULL -> `* OUTER`, default LEFT
  *    OUTER: :190-195
  *  - select expr: expression > qualified view column (multi-source) > bare
  *    column: :197-204; missing columns -> NULL filler :280-282
  *  - view emission per source table from one topic with a `$.tbl`
  *    discriminator: sttm2flink-ui-5_4/sttm2flink/generator.py:239-272
  */
object ColumnSpecCompiler {

  final case class Row(
      sourceTable: String, sourceColumn: String, dataType: String,
      targetTable: String, targetColumn: String, expression: String,
      filter: String, joinOrder: String, joinType: String, joinCondition: String)

  final case class Config(
      viewPrefix: String = "hm_",
      viewSuffix: String = "_vw",
      sourceViewFrom: String = "public.events",
      jsonColumn: String = "value",
      tblPath: String = "$.tbl",
      sinkValueFormat: String = "avro-registry")

  /** Parse the lowercase column-spec CSV layout. */
  def fromCsv(text: String): Seq[Row] = {
    val rows = SttmParser.splitCsv(text)
    if (rows.isEmpty) return Nil
    val header = rows.head.map(_.trim.toLowerCase)
    def idx(name: String) = header.indexOf(name)
    rows.tail.map { cells =>
      def g(name: String) = {
        val i = idx(name)
        if (i < 0 || i >= cells.length) "" else {
          val v = cells(i).trim
          if (v.equalsIgnoreCase("nan")) "" else v
        }
      }
      Row(g("source_table"), g("source_column"), g("data_type"),
        g("target_table"), g("target_column"), g("expression"),
        normalizeWs(g("filter")), g("join_order"), g("join_type"),
        normalizeWs(g("join_condition")))
    }.filter(r => r.targetTable.nonEmpty || r.sourceTable.nonEmpty)
  }

  def normalizeWs(s: String): String = s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  def viewName(cfg: Config, table: String): String =
    s"${cfg.viewPrefix}$table${cfg.viewSuffix}"

  def normalizeJoinType(jt: String): String = jt.trim.toUpperCase match {
    case "" | "LEFT" => "LEFT OUTER"
    case "RIGHT" => "RIGHT OUTER"
    case "FULL" => "FULL OUTER"
    case s @ ("LEFT OUTER" | "INNER" | "RIGHT OUTER" | "FULL OUTER") => s
    case _ => "LEFT OUTER"
  }

  /** `<name>_vw` references in a join condition, first-seen order. */
  def extractViewRefs(cond: String): Seq[String] =
    """([A-Za-z0-9_]+_vw)\.""".r.findAllMatchIn(cond).map(_.group(1)).toSeq.distinct

  private def toOrder(v: String): Int = v.trim.toIntOption.getOrElse(1000000)

  /** One CREATE VIEW per distinct source table: JSON_VALUE projection of all
    * referenced source columns from the shared topic, demuxed on `$.tbl`. */
  private def viewColumns(rows: Seq[Row]): Seq[(String, Seq[String])] = {
    val srcMap = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    rows.foreach { r =>
      if (r.sourceTable.nonEmpty && r.sourceColumn.nonEmpty) {
        val cur = srcMap.getOrElse(r.sourceTable, Nil)
        if (!cur.contains(r.sourceColumn))
          srcMap(r.sourceTable) = cur :+ r.sourceColumn
      }
    }
    srcMap.toSeq
  }

  def emitViews(rows: Seq[Row], cfg: Config): Seq[(String, String)] =
    viewColumns(rows).map { case (tbl, cols) =>
      val name = viewName(cfg, tbl)
      val selects = cols.map(c => s"  JSON_VALUE(${cfg.jsonColumn}, '$$.$c') AS `$c`")
      val sql = s"CREATE VIEW `$name` AS\nSELECT\n" + selects.mkString(",\n") +
        s"\nFROM ${cfg.sourceViewFrom} AS `e`" +
        s"\nWHERE JSON_VALUE(${cfg.jsonColumn}, '${cfg.tblPath}') = '$tbl';"
      name -> sql
    }

  /** The export-artifact flavor of [[emitViews]]: byte-for-byte the
    * reference's emitted view style (final-output.sql:3-31 — header column
    * list, un-aliased selects, lowercase keywords, `where` on its own
    * line). [[emitViews]]' backticked/aliased flavor stays the execution
    * path; GoldenSqlSpec byte-compares this one against the golden file. */
  def emitViewsGolden(rows: Seq[Row], cfg: Config): Seq[(String, String)] =
    viewColumns(rows).map { case (tbl, cols) =>
      val name = viewName(cfg, tbl)
      val json = cfg.jsonColumn.toLowerCase
      val selects = cols.map(c => s"  json_value($json, '$$.$c')")
      val sql = s"create view $name (${cols.mkString(", ")}) as\nselect\n" +
        selects.mkString(",\n") +
        s"\nfrom ${cfg.sourceViewFrom}\nwhere\n" +
        s"  json_value($json, '${cfg.tblPath}') = '$tbl';"
      name -> sql
    }

  /** INSERT for one target: UNION-ALL arms with shared column list. Returns
    * (columnList, selectSql). */
  def buildInsertSelect(rows: Seq[Row], target: String, cfg: Config): (Seq[String], String) = {
    val trows = rows.filter(_.targetTable == target)
    val tgtOrder = trows.map(_.targetColumn).filter(_.nonEmpty).distinct
    val arms = scala.collection.mutable.LinkedHashMap.empty[(String, String), Seq[Row]]
    trows.foreach { r =>
      val k = (r.filter, if (r.joinCondition.nonEmpty) r.joinCondition else "NOJOIN")
      arms(k) = arms.getOrElse(k, Nil) :+ r
    }
    val armSqls = arms.toSeq.map { case ((filt, _), grp) =>
      val srcs = grp.map(_.sourceTable).filter(_.nonEmpty).distinct
      val multi = srcs.length > 1
      val driving = {
        val sorted = grp.zipWithIndex.sortBy { case (r, i) => (toOrder(r.joinOrder), i) }
        val srcTable = sorted.head._1.sourceTable
        require(srcTable.nonEmpty,
          s"[$target] arm (filter='$filt') has no row with a source_table — " +
            "expression-only arms still need a driving table on at least one row")
        viewName(cfg, srcTable)
      }
      val joinBlock = buildJoinBlock(grp, driving)
      val exprByTgt = scala.collection.mutable.LinkedHashMap.empty[String, String]
      grp.foreach { r =>
        if (r.targetColumn.nonEmpty && !exprByTgt.contains(r.targetColumn)) {
          exprByTgt(r.targetColumn) =
            if (r.expression.nonEmpty) r.expression
            else if (multi) s"${viewName(cfg, r.sourceTable)}.${r.sourceColumn}"
            else r.sourceColumn
        }
      }
      val selects = tgtOrder.map(c => s"  ${exprByTgt.getOrElse(c, "NULL")} AS $c")
      val where = if (filt.nonEmpty) s"\nWHERE $filt" else ""
      s"SELECT\n${selects.mkString(",\n")}\nFROM $driving$joinBlock$where"
    }
    (tgtOrder, armSqls.mkString("\nUNION ALL\n"))
  }

  private def buildJoinBlock(grp: Seq[Row], driving: String): String = {
    val conds = scala.collection.mutable.LinkedHashMap.empty[String, (Int, String, String, Seq[String])]
    grp.foreach { r =>
      if (r.joinCondition.nonEmpty) {
        val key = r.joinCondition
        conds.get(key) match {
          case None =>
            conds(key) = (toOrder(r.joinOrder), normalizeJoinType(r.joinType),
              r.joinCondition, extractViewRefs(r.joinCondition))
          case Some((o, t, c, refs)) =>
            conds(key) = (math.min(o, toOrder(r.joinOrder)), t, c, refs)
        }
      }
    }
    val used = scala.collection.mutable.Set(driving)
    val lines = conds.values.toSeq.sortBy { case (o, _, c, _) => (o, c) }.flatMap {
      case (_, jty, cond, refs) =>
        val right = refs.find(v => !used.contains(v)).orElse(refs.headOption)
        right match {
          case Some(r) if !used.contains(r) =>
            used += r
            Some(s"$jty JOIN $r ON $cond")
          case _ => None
        }
    }
    if (lines.isEmpty) "" else "\n" + lines.mkString("\n")
  }

  /** Sink DDL in the v4.5 bundle shape (final-output.sql:36-76): drop +
    * create with per-column target types (default string) and the
    * configured sink value format. */
  def emitTableDdl(rows: Seq[Row], target: String, cfg: Config): String = {
    val trows = rows.filter(_.targetTable == target)
    val cols = scala.collection.mutable.LinkedHashMap.empty[String, String]
    trows.foreach { r =>
      if (r.targetColumn.nonEmpty && !cols.contains(r.targetColumn))
        cols(r.targetColumn) =
          if (r.dataType.nonEmpty) r.dataType else "string"
    }
    val colSql = cols.map { case (c, t) => s"  $c $t" }.mkString(",\n")
    s"drop table if exists $target;\n" +
      s"create table $target (\n$colSql\n)\n" +
      s"with ('value.format'='${cfg.sinkValueFormat}');"
  }

  /** The consolidated v4.5 bundle (final-output.sql structure): VIEWS,
    * SINK TABLES, then an `execute statement set` of the INSERTs — the
    * artifact GoldenSqlSpec shape-diffs against the reference's committed
    * golden output. */
  def emitBundle(rows: Seq[Row], cfg: Config): String = {
    val views = emitViewsGolden(rows, cfg).map(_._2).mkString("\n\n")
    val targets = rows.map(_.targetTable).filter(_.nonEmpty).distinct
    val ddls = targets.map(t => emitTableDdl(rows, t, cfg)).mkString("\n\n")
    val inserts = targets.map { t =>
      val (cols, select) = buildInsertSelect(rows, t, cfg)
      s"INSERT INTO $t (${cols.mkString(", ")})\n$select;"
    }.mkString("\n\n")
    // separators are part of the byte contract: each section ends with the
    // final statement's `;`, one blank line, one more blank line, header
    s"-- ===== VIEWS =====\n\n$views\n\n\n" +
      s"-- ===== SINK TABLES =====\n\n$ddls\n\n\n" +
      s"-- ===== INSERTS =====\nexecute statement set\nbegin\n$inserts\nend;\n"
  }

  /** Format auto-detection (generator.py:_detect_format): a sheet with
    * target_table + target_column headers is column-spec; otherwise
    * row-per-table. */
  def detectFormat(header: Seq[String]): String = {
    val h = header.map(_.trim.toLowerCase.replaceAll("\\s+", "_"))
    if (h.contains("target_table") && h.contains("target_column")) "column-spec"
    else "row-per-table"
  }

  /** Row-per-table mode (generator.py:119-129): every sheet row describes one
    * table; emitted DDL has one STRING column per non-meta sheet column
    * (schema/table excluded), defaulting to a single `id` column. */
  def rowPerTableDdl(header: Seq[String], rows: Seq[Seq[String]],
                     namePrefix: String = ""): Seq[(String, String)] = {
    val h = header.map(_.trim)
    val tableIdx = h.indexWhere(_.equalsIgnoreCase("table"))
    val schemaIdx = h.indexWhere(_.equalsIgnoreCase("schema"))
    rows.zipWithIndex.map { case (cells, i) =>
      val schema = if (schemaIdx >= 0) cells.lift(schemaIdx).filter(_.nonEmpty)
        .getOrElse("public") else "public"
      val table = namePrefix + (if (tableIdx >= 0)
        cells.lift(tableIdx).filter(_.trim.nonEmpty).getOrElse(s"table_$i")
        else s"table_$i")
      val cols = h.zipWithIndex.collect {
        case (c, idx) if idx != tableIdx && idx != schemaIdx && c.nonEmpty => c
      }
      val colSql =
        if (cols.isEmpty) "`id` STRING"
        else cols.map(c => s"`$c` STRING").mkString(",\n  ")
      table -> s"CREATE TABLE `$schema`.`$table` (\n  $colSql\n);"
    }
  }

  /** Compile + execute on Spark: registers the per-source views as temp
    * views, then returns one DataFrame per target (lazy plans). */
  def run(spark: SparkSession, rows: Seq[Row], cfg: Config): Map[String, DataFrame] = {
    FlinkCompat.register(spark)
    emitViews(rows, cfg).foreach { case (name, sql) =>
      // CREATE VIEW text is the export artifact; execution path registers the
      // SELECT part as a temp view (Spark temp views aren't schema-qualified)
      val select = sql.split("\\n", 2)(1).stripSuffix(";")
      spark.sql(select).createOrReplaceTempView(name)
    }
    rows.map(_.targetTable).filter(_.nonEmpty).distinct.map { target =>
      val (_, select) = buildInsertSelect(rows, target, cfg)
      target -> spark.sql(select)
    }.toMap
  }
}

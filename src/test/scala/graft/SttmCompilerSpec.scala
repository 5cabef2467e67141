package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.compile.{CompilerOptions, DemoSpecs, PipelineCompiler}
import graft.spec.{SttmParser, SttmSpec, TableMatrix}
import graft.validate.SttmValidation

/** Spec parsing, validation, and compiled-artifact shape — mirrors the
  * reference's end-to-end generate test (test_sttm_to_flink_v22.py:187-274)
  * at the artifact level (section markers, DDL shape, statement set). */
class SttmCompilerSpec extends AnyFunSuite {

  test("csv parser handles quoted fields with embedded commas") {
    val rows = SttmParser.splitCsv("a,\"b,c\",\"d\"\"e\"\nf,,g")
    assert(rows == Seq(Seq("a", "b,c", "d\"e"), Seq("f", "", "g")))
  }

  test("demo spec parses with stable stage ordering") {
    val spec = DemoSpecs.jsonPipeline
    val order = spec.grouped.map(_._1)
    assert(order == Seq("CUST_VW", "EVENTS_VW", "FGAC_USER_REF", "QUAR_USER", "XREF_USER")
      .sortBy(t => (Map("CUST_VW" -> 0, "EVENTS_VW" -> 0, "XREF_USER" -> 1,
        "FGAC_USER_REF" -> 2, "QUAR_USER" -> 2)(t), t)))
    // PK rows sort first within a table
    val ev = spec.grouped.find(_._1 == "EVENTS_VW").get._2
    assert(ev.head.targetColumn == "USER_ID" && ev.head.isPk)
  }

  test("matrix props: macro expansion, skip na, logical-name preference") {
    val m = SttmParser.matrixFromCsv(
      "Key,T1,T2\ntopic,pre.${table_name},na\nmode,upsert,append\n")
    assert(m.propsFor("T1", "T1") == Map("topic" -> "pre.T1", "mode" -> "upsert"))
    assert(m.propsFor("T2", "T2") == Map("mode" -> "append")) // na skipped
    assert(m.propsFor("nope", "nope") == Map.empty)
  }

  test("validation: duplicate target column is an error") {
    val rows = SttmParser.mappingFromCsv(
      SttmRowCsv.header +
        "View,V1,C1,STRING,N,,JSON,,src,t,k,,,,,,,,\n" +
        "View,V1,C1,STRING,N,,JSON,,src,t,k,,,,,,,,\n")
    val issues = SttmValidation.validateMapping(rows)
    assert(issues.exists(i => i.level == SttmValidation.Error &&
      i.message.contains("duplicate TargetColumn: C1")))
  }

  test("validation: XREF without upsert in matrix is an error") {
    val spec = SttmSpec(
      SttmParser.mappingFromCsv(
        SttmRowCsv.header + "XREF,XREF_A,C1,STRING,Y,,,,src,t,f,,,,,,,,\n"),
      SttmParser.matrixFromCsv("Key,XREF_A\nchangelog.mode,append\n"))
    val issues = SttmValidation.validate(spec)
    assert(issues.exists(_.message.contains("must set changelog.mode=upsert")))
  }

  test("validation: JSON key starting with $ is an error") {
    val rows = SttmParser.mappingFromCsv(
      SttmRowCsv.header + "View,V1,C1,STRING,N,,JSON,$.bad,src,t,,,,,,,,,\n")
    val issues = SttmValidation.validateMapping(rows)
    assert(issues.exists(_.message.contains("must not start with '$'")))
  }

  test("validation: demo pipeline is clean of errors") {
    assert(PipelineCompiler.compile(DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions)
      .errors.isEmpty)
  }

  test("compiled artifacts: view/table/insert shape and statement set") {
    val p = PipelineCompiler.compile(DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions)
    val xref = p.tables.find(_.name == "XREF_USER").get
    assert(xref.tableDdl.contains("CREATE TABLE IF NOT EXISTS `XREF_USER`"))
    assert(xref.tableDdl.contains("PRIMARY KEY (USER_ID) NOT ENFORCED"))
    assert(xref.tableDdl.contains("'changelog.mode' = 'upsert'"))
    assert(xref.tableDdl.contains("'topic' = 'xref.XREF_USER'")) // macro expanded
    assert(xref.insertSql.startsWith("INSERT INTO `XREF_USER` (USER_ID, EVENT_ID, K, TS, VALUE)"))
    val ev = p.tables.find(_.name == "EVENTS_VW").get
    assert(ev.viewSql.startsWith("CREATE VIEW `EVENTS_VW` AS"))
    assert(ev.selectSql.contains("JSON_VALUE(CAST(props AS STRING), '$.k')"))
    assert(ev.selectSql.contains("WHERE event_type = 'purchase'"))
    val fgac = p.tables.find(_.name == "FGAC_USER_REF").get
    assert(fgac.selectSql.contains("LEFT JOIN `CUST_VW` c ON p.USER_ID = c.C_CUSTKEY"))
    val all = p.allSql
    assert(all.indexOf("-- ===== VIEWS =====") >= 0)
    assert(all.indexOf("-- ===== VIEWS =====") < all.indexOf("-- ===== TABLES"))
    assert(all.indexOf("-- ===== TABLES") < all.indexOf("EXECUTE STATEMENT SET"))
    assert(all.contains("BEGIN") && all.contains("END;"))
    // XREF inserts precede FGAC inserts inside the statement set
    assert(all.indexOf("INSERT INTO `XREF_USER`") < all.indexOf("INSERT INTO `FGAC_USER_REF`"))
  }

  test("xlsx parser reads the reference STTM_v22 workbook") {
    val spec = SttmParser.fromXlsx("/root/reference/resources/STTM_v22.xlsx")
    val tables = spec.rows.map(_.targetTable).distinct
    assert(tables.contains("CBA_CI_ADR_view"))
    assert(spec.rows.exists(r => r.targetColumn == "ADR_ID" && r.isPk))
    assert(spec.rows.exists(_.filterPredicate.contains("INFA_TABLE_NAME LIKE")))
    // matrix sheet parsed
    assert(spec.matrix.tables.nonEmpty)
  }
}

object SttmRowCsv {
  val header: String =
    "PipelineStage,TargetTable,TargetColumn,TargetDataType,IsTargetPK,TargetPK," +
    "MessageFormat,FieldSelector,SourcePrimaryTable,SourcePrimaryAlias,SourceField," +
    "ExprOverride,SourceTransformExpr,FilterPredicate,JoinTable,JoinAlias,JoinType," +
    "JoinCondition,Notes\n"
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.compile.{Bundle, DemoSpecs, PipelineCompiler}
import graft.validate.SqlValidation

class SqlValidationSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("with-block strip respects quotes and nesting") {
    val sql = """CREATE TABLE t (a INT) WITH ('k' = 'v(1)', 'q' = 'it''s') ;"""
    val out = SqlValidation.stripWithBlock(sql)
    assert(!out.toUpperCase.contains("WITH"))
    assert(out.contains("CREATE TABLE t (a INT)"))
    // no WITH -> unchanged
    assert(SqlValidation.stripWithBlock("SELECT 1") == "SELECT 1")
  }

  test("statement-set unwrap and quote-aware split") {
    val sql = "EXECUTE STATEMENT SET\nBEGIN\nINSERT INTO a SELECT ';' AS x;\nINSERT INTO b SELECT 1;\nEND;"
    val stmts = SqlValidation.splitStatements(SqlValidation.unwrapStatementSet(sql))
    assert(stmts.length == 2)
    assert(stmts.head.contains("';'")) // semicolon inside quotes survives
  }

  test("split is comment-aware: ';' inside comments does not split") {
    val sql = "SELECT 1 -- note; not a boundary\nFROM t;\n" +
      "/* multi;\n   line; block */ SELECT 2 FROM u;"
    val stmts = SqlValidation.splitStatements(sql)
    assert(stmts.length == 2, s"got ${stmts.length}: $stmts")
    assert(stmts.head.contains("not a boundary"))
    assert(stmts(1).contains("line; block"))
    // '--' inside a string literal is NOT a comment opener
    val tricky = SqlValidation.splitStatements("SELECT 'a--b;c' FROM t; SELECT 2;")
    assert(tricky.length == 2 && tricky.head.contains("'a--b;c'"))
  }

  test("comment strip and whitespace normalization") {
    val s = "/* block */ SELECT 1 -- tail\n  -- full line\n  FROM   t"
    assert(SqlValidation.stripComments(s).contains("SELECT 1"))
    // reference behavior: only whole-line '--' comments are stripped
    // (v4_5:_strip_sql_comments uses ^\s*--); trailing ones survive
    assert(SqlValidation.stripComments(s).contains("-- tail"))
    assert(!SqlValidation.stripComments(s).contains("full line"))
    assert(SqlValidation.normalizeWhitespace("a   b\n\n  c  d ") == "a b\nc d")
    assert(SqlValidation.diff("a\nb", "a\nb") == "No differences.")
    assert(SqlValidation.diff("a", "b").contains("- a"))
  }

  test("catalyst validates every statement of the compiled demo pipeline") {
    spark.sparkContext.setLogLevel("ERROR")
    val p = PipelineCompiler.compile(DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions)
    val results = SqlValidation.validate(spark, p.allSql)
    assert(results.nonEmpty)
    val bad = results.filter(!_.ok)
    assert(bad.isEmpty, s"unparseable: ${bad.map(_.error)}")
    val csv = SqlValidation.reportCsv(results)
    assert(csv.startsWith("Result,SQL"))
    assert(csv.linesIterator.count(_.startsWith("OK")) == results.length)
  }

  test("invalid sql is reported, not thrown") {
    val r = SqlValidation.validate(spark, "SELEKT 1 FRM nowhere;")
    assert(r.length == 1 && !r.head.ok && r.head.error.nonEmpty)
  }

  test("bundle artifacts: grouped files, yaml literals, validation csv") {
    val p = PipelineCompiler.compile(DemoSpecs.jsonPipeline, DemoSpecs.jsonOptions)
    val a = Bundle.artifacts(p, Some(spark))
    val names = a.files.map(_._1)
    assert(names.contains("bundle/create.sql"))
    assert(names.contains("bundle/views.sql"))
    assert(names.contains("bundle/inserts_statement_set.sql"))
    assert(names.contains("00_all.sql"))
    assert(names.contains("views.yaml"))
    assert(names.contains("issues_v22.csv"))
    assert(names.contains("validation/sql_report.csv"))
    val yaml = a.files.toMap.apply("views.yaml")
    assert(yaml.startsWith("SQL queries: |"))
    assert(yaml.linesIterator.drop(1).forall(l => l.isEmpty || l.startsWith("  ")))
    val zip = a.toZip
    assert(zip.length > 200)
    // round-trip one file from the zip
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zip))
    val entries = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map(_.getName).toSeq
    assert(entries.contains("bundle/views.sql"))
  }
}

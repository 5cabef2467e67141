package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.validate.SqlValidation

/** The engine's compat layer must accept the reference's own emitted and
  * hand-written Flink SQL verbatim — EXCEPT where the reference artifacts
  * contain genuine SQL bugs, which our Catalyst-backed validation catches
  * and the reference's sqlglot gate did not:
  *
  *  - final-output.sql:98 is missing `then` in a CASE arm
  *    (`... and is_decimal(x) to_timestamp_ltz(...)`), yet the committed
  *    final-output.sql_validation.csv marks all 18 statements OK — sqlglot's
  *    lenient hive dialect swallowed the malformed arm.
  *  - xref-queries.sql uses the unquoted dash identifier
  *    `FROM ClientRepo-Kafka-Topic` (invalid without backticks in Flink too).
  *
  * Everything else parses statement-for-statement after the documented
  * dialect neutralizations (WITH strip, NOT ENFORCED PK, type precision).
  */
class GoldenSqlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def validateFile(path: String): Seq[SqlValidation.Result] = {
    spark.sparkContext.setLogLevel("ERROR")
    SqlValidation.validate(spark, Files.readString(Paths.get(path)))
  }

  test("final-output.sql: 17/18 statements parse; the 18th is the missing-then bug") {
    val results = validateFile("/root/reference/resources/output/final-output.sql")
    assert(results.length == 18)
    val bad = results.filter(!_.ok)
    assert(bad.length == 1, s"unexpected failures: ${bad.map(_.statement.take(80))}")
    // the one failure is exactly the reference's malformed CASE arm
    assert(bad.head.statement.contains("is_decimal(cba_ci_modifiedon)"))
    assert(bad.head.statement.contains("INSERT INTO hm_cba_ci "))
  }

  test("xref-queries.sql: only the dash-identifier views fail") {
    val results = validateFile("/root/reference/resources/sql/xref-queries.sql")
    val bad = results.filter(!_.ok)
    assert(bad.nonEmpty && bad.forall(_.statement.contains("FROM ClientRepo-Kafka-Topic")),
      s"unexpected failures: ${bad.map(_.statement.take(80))}")
    // every statement NOT using the invalid identifier parses
    assert(results.count(_.ok) == results.length - bad.length)
    assert(results.count(_.ok) >= 6)
  }

  test("bundle shape-diff against the reference's committed final-output.sql") {
    // Regenerate the golden bundle from a column-spec sheet describing the
    // same pipeline (the repo's STTM_v5 workbook is itself a lossy re-
    // derivation "from final SQL images", so the spec is authored here) and
    // compare STRUCTURE + normalized statement text. Pinned divergences:
    //  1. final-output.sql:98 is missing `then` in a CASE arm (the genuine
    //     reference bug GoldenSqlSpec already pins) — patched before diff.
    //  2. golden CREATE VIEW carries a header column list with un-aliased
    //     selects; ours aliases each select instead — views are compared as
    //     (name, columns, source, discriminator) shapes, not text.
    //  3. backticks, keyword case, and the view's `AS e` source alias are
    //     normalization-level differences.
    import graft.compile.ColumnSpecCompiler
    import graft.compile.ColumnSpecCompiler.Config
    val golden = Files.readString(
      Paths.get("/root/reference/resources/output/final-output.sql"))
    val rowsIn = new String(
      getClass.getResourceAsStream("/graft/golden_colspec.csv").readAllBytes(), "UTF-8")
    val ours = ColumnSpecCompiler.emitBundle(
      ColumnSpecCompiler.fromCsv(rowsIn),
      Config(viewPrefix = "hm_", viewSuffix = "_vw", sourceViewFrom = "hm_db",
        jsonColumn = "CAST(val AS STRING)", tblPath = "$.tbl"))

    def norm(s: String): String =
      s.replace("`", "").toLowerCase
        .split("\\s+").filter(_.nonEmpty).mkString(" ").trim
    def sections(text: String): Map[String, String] = {
      val parts = "-- ===== ([A-Za-z ()+&]+) =====".r.split(text)
      val names = "-- ===== ([A-Za-z ()+&]+) =====".r
        .findAllMatchIn(text).map(_.group(1).trim).toSeq
      names.zip(parts.tail).toMap
    }
    val gs = sections(golden)
    val os = sections(ours)
    // 1. section order + titles identical
    assert(gs.keySet == os.keySet && gs.keySet ==
      Set("VIEWS", "SINK TABLES", "INSERTS"))

    // 2. views: same (name, columns, source table, discriminator) shapes
    def goldenViewShapes(sec: String) =
      SqlValidation.splitStatements(sec).map { st =>
        val n = norm(st)
        val name = "create view (\\S+) \\(".r.findFirstMatchIn(n).get.group(1)
        val cols = n.substring(n.indexOf("(") + 1, n.indexOf(") as select"))
          .split(",\\s*").map(_.trim).toSeq
        val src = "from (\\S+) where".r.findFirstMatchIn(n).get.group(1)
        val disc = "= '([a-z0-9_]+)'$".r.findFirstMatchIn(n).get.group(1)
        (name, cols, src, disc)
      }
    def ourViewShapes(sec: String) =
      SqlValidation.splitStatements(sec).map { st =>
        val n = norm(st)
        val name = "create view (\\S+) as".r.findFirstMatchIn(n).get.group(1)
        val cols = "as ([a-z0-9_]+)[,\\s]".r.findAllMatchIn(n + " ")
          .map(_.group(1)).filter(c => c != "select" && c != "e").toSeq
        val src = "from (\\S+)".r.findFirstMatchIn(n).get.group(1)
        val disc = "= '([a-z0-9_]+)'$".r.findFirstMatchIn(n).get.group(1)
        (name, cols, src, disc)
      }
    assert(goldenViewShapes(gs("VIEWS")) == ourViewShapes(os("VIEWS")))

    // 3. sink DDL + inserts: normalized text identical (after the pinned
    //    missing-`then` patch on the golden side)
    val goldenFixed = norm(gs("SINK TABLES") + gs("INSERTS")).replace(
      "is_decimal(cba_ci_modifiedon) to_timestamp_ltz(coalesce(try_cast(cba_ci_modifiedon as bigint)*1000",
      "is_decimal(cba_ci_modifiedon) then to_timestamp_ltz(coalesce(try_cast(cba_ci_modifiedon as bigint)*1000")
    val oursNorm = norm(os("SINK TABLES") + os("INSERTS"))
    assert(goldenFixed == oursNorm, {
      val g = goldenFixed; val o = oursNorm
      val i = g.zip(o).indexWhere { case (a, b) => a != b }
      val at = if (i < 0) math.min(g.length, o.length) else i
      s"bundle text diverges at char $at:\n  golden: ...${g.slice(at - 60, at + 80)}\n  ours:   ...${o.slice(at - 60, at + 80)}"
    })
  }

  test("hand-written history/SPLIT_INDEX queries parse completely") {
    val results = validateFile("/root/reference/resources/sql/history-queries.sql")
    assert(results.nonEmpty)
    val bad = results.filter(!_.ok)
    assert(bad.isEmpty,
      s"${bad.length}/${results.length} failed:\n" +
        bad.map(b => s"  ${b.error.getOrElse("")}: ${b.statement.take(100)}").mkString("\n"))
  }
}

package graft.validate

import org.apache.spark.sql.SparkSession
import graft.functions.FlinkCompat

/** Static SQL validation (V3) and SQL text hygiene (V5).
  *
  * Where the reference shells out to sqlglot with a dialect fallback chain
  * (flinksql_from_sttm_v4_5.py:309-447, sttm2flink/validation.py:5-21),
  * this engine IS a SQL engine — Catalyst's parser performs the syntax
  * check, and analysis against the session catalog adds semantic validation
  * the reference never had. The pre-processing utilities are ported exactly:
  * statement-set unwrap, quote/paren-aware WITH(...) strip, quote-aware
  * statement split, comment strip (v4_5:310-375; utils.py:7-25).
  */
object SqlValidation {

  /** Strip a CREATE TABLE's WITH (...) options block, respecting quotes and
    * nested parentheses (the options are Flink/connector metadata that no
    * parser should see). */
  def stripWithBlock(s: String): String = {
    val m = "(?i)\\bWITH\\s*\\(".r.findFirstMatchIn(s).getOrElse(return s)
    val start = m.start
    var j = m.end - 1 // position of '('
    var depth = 0
    var inS = false
    var inD = false
    var endExclusive = -1
    while (j < s.length && endExclusive < 0) {
      val ch = s.charAt(j)
      if (ch == '\'' && !inD) inS = !inS
      else if (ch == '"' && !inS) inD = !inD
      if (!inS && !inD) {
        if (ch == '(') depth += 1
        else if (ch == ')') {
          depth -= 1
          if (depth == 0) endExclusive = j + 1
        }
      }
      j += 1
    }
    if (endExclusive < 0) s // malformed; let the parser report it
    else s.substring(0, start) + s.substring(endExclusive)
  }

  /** Unwrap EXECUTE STATEMENT SET BEGIN ... END; to its inner statements. */
  def unwrapStatementSet(sql: String): String =
    "(?is)execute\\s+statement\\s+set\\s+begin(.*?)end\\s*;".r
      .replaceAllIn(sql, m => scala.util.matching.Regex.quoteReplacement(m.group(1)))

  /** Quote-aware split on ';'. */
  def splitStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val buf = new StringBuilder
    var inS = false
    var inD = false
    sql.foreach { ch =>
      if (ch == '\'' && !inD) inS = !inS
      else if (ch == '"' && !inS) inD = !inD
      if (ch == ';' && !inS && !inD) {
        val st = buf.result().trim
        if (st.nonEmpty) out += st
        buf.clear()
      } else buf += ch
    }
    val tail = buf.result().trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** Remove block and line comments (v4_5:368-372). */
  def stripComments(s: String): String =
    s.replaceAll("(?s)/\\*.*?\\*/", "").replaceAll("(?m)^\\s*--.*$", "")

  /** Collapse whitespace and blank lines without reordering (utils.py:16-20). */
  def normalizeWhitespace(s: String): String =
    s.linesIterator.map(_.split("\\s+").filter(_.nonEmpty).mkString(" "))
      .filter(_.nonEmpty).mkString("\n").trim

  /** One-line form for CSV reports (v4_5:_flatten_for_csv). */
  def flattenForCsv(s: String): String =
    s.replaceAll("[\\r\\n]+", " ").replaceAll("[ \\t]+", " ").trim

  /** Unified-ish diff of two SQL texts ("No differences." on match). */
  def diff(a: String, b: String): String = {
    val al = a.linesIterator.toSeq
    val bl = b.linesIterator.toSeq
    if (al == bl) "No differences."
    else {
      val sb = Seq.newBuilder[String]
      val n = math.max(al.length, bl.length)
      (0 until n).foreach { i =>
        val x = al.lift(i)
        val y = bl.lift(i)
        if (x != y) {
          x.foreach(v => sb += s"- $v")
          y.foreach(v => sb += s"+ $v")
        }
      }
      sb.result().mkString("\n")
    }
  }

  final case class Result(statement: String, ok: Boolean, error: Option[String])

  /** Validate a consolidated SQL text: unwrap statement sets, split, strip
    * WITH blocks, then parse each statement with Catalyst. `analyze = true`
    * additionally resolves the plan against the session catalog (semantic
    * check — unknown tables/columns fail). Skips comment-only fragments. */
  def validate(spark: SparkSession, sql: String, analyze: Boolean = false): Seq[Result] = {
    FlinkCompat.register(spark)
    splitStatements(unwrapStatementSet(sql))
      .filter(st => stripComments(st).trim.nonEmpty)
      .map { st =>
        val prepared = stripComments(stripWithBlock(st)).trim
        // Flink-only DDL attributes Spark's parser rejects; neutralize for
        // the syntax check exactly like the reference's dialect fallbacks:
        // PRIMARY KEY NOT ENFORCED, and type precision on TIMESTAMP[_LTZ](p)
        // (Flink tracks sub-second precision in the type; Spark does not —
        // the lookbehind keeps to_timestamp_ltz(x, 3) CALLS untouched)
        val neutral = prepared
          .replaceAll("(?i),?\\s*PRIMARY KEY \\([^)]*\\) NOT ENFORCED", "")
          .replaceAll("(?i)(?<![a-z0-9_])timestamp_ltz\\s*\\(\\s*\\d+\\s*\\)", "TIMESTAMP_LTZ")
          .replaceAll("(?i)(?<![a-z0-9_])timestamp\\s*\\(\\s*\\d+\\s*\\)", "TIMESTAMP")
        try {
          val plan = spark.sessionState.sqlParser.parsePlan(neutral)
          if (analyze && neutral.toUpperCase.startsWith("SELECT")) {
            spark.sql(neutral).queryExecution.analyzed
          }
          Result(flattenForCsv(st), ok = true, None)
        } catch {
          case e: Exception =>
            Result(flattenForCsv(st), ok = false, Some(e.getMessage.takeWhile(_ != '\n')))
        }
      }
  }

  /** CSV report in the reference's (Result, SQL) shape. */
  def reportCsv(results: Seq[Result]): String =
    ("Result,SQL" +: results.map { r =>
      val res = if (r.ok) "OK" else s"ERROR: ${r.error.getOrElse("")}"
      def esc(v: String) =
        if (v.contains(",") || v.contains("\"")) "\"" + v.replace("\"", "\"\"") + "\"" else v
      s"${esc(res)},${esc(r.statement)}"
    }).mkString("\n")
}

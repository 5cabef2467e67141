package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.exprs.ExprCompiler
import graft.spec.SttmRow

/** Mirrors the reference's expression-builder truth tables
  * (tests/test_sttm_to_flink_v22.py:43-119) plus seeded property-style tests
  * for the CSV auto-index reservation algorithm and the predicate rewriter. */
class ExprCompilerSpec extends AnyFunSuite {

  private def viewRow(override_ : String = "", stx: String = "", tgt: String = "STRING",
                      mf: String = "", sf: String = "", fsel: String = "",
                      col: String = "c"): SttmRow =
    SttmRow(pipelineStage = "View", targetTable = "T", targetColumn = col,
      targetDataType = tgt, messageFormat = mf, sourceField = sf,
      fieldSelector = fsel, exprOverride = override_, sourceTransformExpr = stx)

  test("sanitize predicate removes leading keywords and trailing semicolons") {
    assert(ExprCompiler.sanitizePredicate("WHERE status = 'A'") == "status = 'A'")
    // trailing space retained, matching the reference's own truth table
    assert(ExprCompiler.sanitizePredicate("  AND id = 5 ;;;") == "id = 5 ")
    assert(ExprCompiler.sanitizePredicate("") == "")
    assert(ExprCompiler.sanitizePredicate("or x=1") == "x=1")
  }

  test("rewrite predicate rewrites bare tokens outside quotes only") {
    val out = ExprCompiler.rewritePredicateAsJson(
      "STATUS = 'ACTIVE' AND EVENT_ID = 10", "payload")
    assert(out.contains("JSON_VALUE(CAST(payload AS STRING), '$.STATUS')"))
    assert(out.contains("JSON_VALUE(CAST(payload AS STRING), '$.EVENT_ID')"))
    assert(out.contains("'ACTIVE'")) // quoted literal untouched
    assert(out.contains("AND"))      // reserved word untouched
  }

  test("rewrite predicate skips short tokens, digits, reserved words") {
    val out = ExprCompiler.rewritePredicateAsJson("ABC = 5 OR LONG_NAME IS NULL", "p")
    assert(out.startsWith("ABC = 5"))  // <=3 chars, no underscore
    assert(out.contains("JSON_VALUE(CAST(p AS STRING), '$.LONG_NAME')"))
    assert(out.contains("IS NULL"))
  }

  test("rewrite predicate respects word boundaries of the full string") {
    // uppercase run preceded by a word char must NOT be rewritten
    // (Python re.match(fp, i) evaluates \b in full-string context)
    assert(ExprCompiler.rewritePredicateAsJson("evtTYPE = 1", "p") == "evtTYPE = 1")
    assert(ExprCompiler.rewritePredicateAsJson("x9ABCD = 1", "p") == "x9ABCD = 1")
    // trailing word char or trailing underscore kills the whole candidate
    assert(ExprCompiler.rewritePredicateAsJson("TYPEx = 1", "p") == "TYPEx = 1")
    assert(ExprCompiler.rewritePredicateAsJson("ABC_ = 1", "p") == "ABC_ = 1")
    // but a clean token right after a non-word char still rewrites
    assert(ExprCompiler.rewritePredicateAsJson("(STATUS_X)", "p")
      == "(JSON_VALUE(CAST(p AS STRING), '$.STATUS_X'))")
  }

  test("rewrite predicate is idempotent when JSON_VALUE already present") {
    val once = ExprCompiler.rewritePredicateAsJson("TBL_NAME = 'x'", "val")
    assert(ExprCompiler.rewritePredicateAsJson(once, "val") == once)
  }

  test("json path: $-prefixed kept, simple dotted, odd keys bracketed") {
    assert(ExprCompiler.jsonPath("$.a.b") == "$.a.b")
    assert(ExprCompiler.jsonPath("field") == "$.field")
    assert(ExprCompiler.jsonPath("weird key") == "$[\"weird key\"]")
    assert(ExprCompiler.jsonPath("", "fallback") == "$.fallback")
    assert(ExprCompiler.jsonPath("") == "$")
  }

  test("view override wins without double cast") {
    val e = ExprCompiler.chooseExpr(
      viewRow(override_ = "CAST(val AS INT)", tgt = "INT", mf = "JSON", sf = "id"),
      isView = true, "payload", ",", Map.empty)
    assert(e == "CAST(val AS INT)")
  }

  test("view transform expr is auto-cast") {
    val e = ExprCompiler.chooseExpr(
      viewRow(stx = "payload->>'id'", tgt = "BIGINT", mf = "JSON", sf = "id"),
      isView = true, "payload", ",", Map.empty)
    assert(e == "CAST(payload->>'id' AS BIGINT)")
  }

  test("json view falls back to TargetColumn as key") {
    val e = ExprCompiler.chooseExpr(
      viewRow(mf = "JSON", col = "target_col"),
      isView = true, "payload_col", ",", Map.empty)
    assert(e.contains("JSON_VALUE(CAST(payload_col AS STRING), '$.target_col')"))
    assert(e.startsWith("CAST("))
    assert(e.contains("TRIM(")) // STRING target -> TRIM normalization
  }

  test("non-string json view wraps with NULLIF before cast") {
    val e = ExprCompiler.chooseExpr(
      viewRow(mf = "JSON", sf = "k", tgt = "INT"),
      isView = true, "props", ",", Map.empty)
    assert(e == "CAST(NULLIF(TRIM(JSON_VALUE(CAST(props AS STRING), '$.k')), '') AS INT)")
  }

  test("csv view uses provided auto index and delimiter") {
    val e = ExprCompiler.chooseExpr(
      viewRow(mf = "CSV", col = "col2"),
      isView = true, "payload_col", "|", Map("col2" -> 3))
    assert(e.contains("SPLIT_INDEX(CAST(payload_col AS STRING), '|', 3)"))
  }

  test("non-view passthrough precedence: override > transform > sourceField > targetColumn > NULL") {
    def nv(ov: String = "", st: String = "", sf: String = "", tc: String = "t") =
      ExprCompiler.chooseExpr(
        SttmRow(targetColumn = tc, exprOverride = ov, sourceTransformExpr = st,
          sourceField = sf),
        isView = false, "p", ",", Map.empty)
    assert(nv(ov = "X") == "X")
    assert(nv(st = "Y") == "Y")
    assert(nv(sf = "source_col") == "source_col")
    assert(nv() == "t")
    assert(nv(tc = "") == "NULL")
  }

  test("csv auto index: blanks get next free, explicit indices reserved, exprs skip") {
    val rows = Seq(
      viewRow(mf = "CSV", col = "a"),                       // auto -> 0? cursor starts 0, 1 reserved
      viewRow(mf = "CSV", col = "b", fsel = "1"),           // explicit 1
      viewRow(mf = "CSV", col = "c"),                       // auto
      viewRow(mf = "CSV", col = "d", override_ = "expr()"), // no index consumed
      viewRow(mf = "CSV", col = "e"))                       // auto
    val idx = ExprCompiler.autoCsvIndex(rows)
    assert(idx("a") == 0)
    assert(!idx.contains("b")) // explicit, not auto-assigned
    assert(idx("c") == 2)      // cursor moved past explicit 1
    assert(!idx.contains("d"))
    assert(idx("e") == 3)
  }

  test("property: auto indices never collide with each other or reservations") {
    val rnd = new scala.util.Random(42)
    val pool = Seq("", "", "", "0", "1", "2", "5")
    (1 to 200).foreach { _ =>
      val sels = Seq.fill(12)(pool(rnd.nextInt(pool.length)))
      val rows = sels.zipWithIndex.map { case (s, i) =>
        viewRow(mf = "CSV", col = s"c$i", fsel = s)
      }
      val idx = ExprCompiler.autoCsvIndex(rows)
      val explicit = rows.filter(_.fieldSelector.nonEmpty).map(_.fieldSelector.toInt)
      val assigned = idx.values.toSeq
      assert(assigned.distinct.size == assigned.size, s"collision for $sels")
      assert(assigned.forall(a => !explicit.contains(a)), s"reserved hit for $sels")
    }
  }

  test("property: predicate rewrite never touches single-quoted content") {
    val rnd = new scala.util.Random(7)
    val pool = Seq("FIELD_A", "X", "AND", "'SOME_LIT'", "42", "STATUS_X")
    (1 to 200).foreach { _ =>
      val toks = Seq.fill(5)(pool(rnd.nextInt(pool.length)))
      val pred = toks.mkString(" ")
      val out = ExprCompiler.rewritePredicateAsJson(pred, "p")
      if (pred.contains("'SOME_LIT'")) assert(out.contains("'SOME_LIT'"))
    }
  }
}

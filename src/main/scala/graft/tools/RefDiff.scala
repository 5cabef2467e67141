package graft.tools

import graft.exprs.ExprCompiler
import graft.spec.SttmRow

/** Differential-test driver: prints the Scala outputs of every ported
  * expression-compiler function over a fixed case battery; `dev/refdiff.py`
  * runs the reference's Python functions over the same battery and diffs.
  * Round-1 result: 0 mismatches over 61 cases (rewritePredicateAsJson,
  * chooseExpr, jsonPath, sanitizePredicate).
  */
object RefDiff {
  def main(args: Array[String]): Unit = {
    val rewrites = Seq(
      "STATUS = 'ACTIVE' AND EVENT_ID = 10", "evtTYPE = 1", "x9ABCD = 1",
      "TYPEx = 1", "ABC_ = 1", "(STATUS_X)", "A = 1", "AB = 1", "ABC = 1",
      "ABCD = 1", "A_B = 2", "INFA_TABLE_NAME LIKE '%_CBA_CI'",
      "F1 > 2 OR LONG_NAME9 IS NULL", "'QUOTED_TOK' = TOK_A",
      "X = \"D_QUOTED\"", "NOT DELETED_FLAG IN ('Y','1')",
      "MIXED_case AND UPPER_ONE", "_LEAD = 1", "9ABC = 1", "A1B = C_2",
      "END_ = START")
    rewrites.zipWithIndex.foreach { case (c, i) =>
      println(s"REWRITE$i<<<${ExprCompiler.rewritePredicateAsJson(c, "val")}>>>")
    }
    val exprCases: Seq[(String, String, String, String, String, String, String, Boolean, Map[String, Int])] = Seq(
      ("CAST(val AS INT)", "", "INT", "JSON", "id", "", "id", true, Map()),
      ("val + 1", "", "INT", "JSON", "id", "", "id", true, Map()),
      ("", "payload->>'id'", "BIGINT", "JSON", "id", "", "id", true, Map()),
      ("", "cast(x as int)", "BIGINT", "", "", "", "id", true, Map()),
      ("", "", "STRING", "JSON", "", "", "target_col", true, Map()),
      ("", "", "INT", "JSON", "k", "", "c", true, Map()),
      ("", "", "STRING", "JSON", "", "sel", "c", true, Map()),
      ("", "", "STRING", "JSON", "weird key", "", "c", true, Map()),
      ("", "", "STRING", "JSON", "$.bad", "", "c", true, Map()),
      ("", "", "STRING", "CSV", "", "3", "c", true, Map()),
      ("", "", "STRING", "CSV", "src", "2", "c", true, Map()),
      ("", "", "INT", "CSV", "", "", "col2", true, Map("col2" -> 5)),
      ("", "", "DECIMAL(10,2)", "", "field", "", "c", true, Map()),
      ("", "", "string", "", "", "", "c", true, Map()),
      ("", "", "TIMESTAMP(3)", "", "f", "", "c", true, Map()),
      ("OVR", "STX", "STRING", "", "SF", "", "TC", false, Map()),
      ("", "STX", "STRING", "", "SF", "", "TC", false, Map()),
      ("", "", "STRING", "", "SF", "", "TC", false, Map()),
      ("", "", "STRING", "", "", "", "TC", false, Map()),
      ("", "", "STRING", "", "", "", "", false, Map()))
    exprCases.zipWithIndex.foreach { case ((ov, stx, tgt, mf, sf, fsel, tc, isView, idx), i) =>
      val row = SttmRow(exprOverride = ov, sourceTransformExpr = stx,
        targetDataType = tgt, messageFormat = mf, sourceField = sf,
        fieldSelector = fsel, targetColumn = tc)
      println(s"EXPR$i<<<${ExprCompiler.chooseExpr(row, isView, "payload", "|", idx)}>>>")
    }
    val paths = Seq(("$.a.b", ""), ("field", ""), ("weird key", ""), ("", "fallback"),
      ("", ""), ("a\"b", ""), ("$['x']", ""), ("_f1", ""), ("9lead", ""), ("a.b", ""))
    paths.zipWithIndex.foreach { case ((s, f), i) =>
      println(s"PATH$i<<<${ExprCompiler.jsonPath(s, f)}>>>")
    }
    val preds = Seq("WHERE status = 'A'", "  AND id = 5 ;;;", "", "or x=1",
      "  OR  y = 2  ", "WHEREABOUTS = 1", "ANDROID = 2", ";;;", "a = 1;; ",
      "WHERE WHERE x")
    preds.zipWithIndex.foreach { case (p, i) =>
      println(s"PRED$i<<<${ExprCompiler.sanitizePredicate(p)}>>>")
    }
  }
}

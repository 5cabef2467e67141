#!/usr/bin/env python3
"""Differential test: Scala expression-compiler outputs vs the reference's
Python functions over the same case battery.

Usage:
  sbt "runMain graft.tools.RefDiff" 2>&1 | grep -oE "(REWRITE|EXPR|PATH|PRED)[0-9]+<<<.*>>>" > /tmp/refdiff_scala.txt
  python3 dev/refdiff.py /tmp/refdiff_scala.txt
"""
import sys, re
sys.path.insert(0, '/root/reference/scripts')
from sttm_to_flink_v22 import rewrite_predicate_as_json, choose_expr, _json_path, sanitize_predicate

rewrites = [
    "STATUS = 'ACTIVE' AND EVENT_ID = 10", "evtTYPE = 1", "x9ABCD = 1",
    "TYPEx = 1", "ABC_ = 1", "(STATUS_X)", "A = 1", "AB = 1", "ABC = 1",
    "ABCD = 1", "A_B = 2", "INFA_TABLE_NAME LIKE '%_CBA_CI'",
    "F1 > 2 OR LONG_NAME9 IS NULL", "'QUOTED_TOK' = TOK_A",
    'X = "D_QUOTED"', "NOT DELETED_FLAG IN ('Y','1')",
    "MIXED_case AND UPPER_ONE", "_LEAD = 1", "9ABC = 1", "A1B = C_2",
    "END_ = START"]
expr_cases = [
    ("CAST(val AS INT)","","INT","JSON","id","","id",True,{}),
    ("val + 1","","INT","JSON","id","","id",True,{}),
    ("","payload->>'id'","BIGINT","JSON","id","","id",True,{}),
    ("","cast(x as int)","BIGINT","","","","id",True,{}),
    ("","","STRING","JSON","","","target_col",True,{}),
    ("","","INT","JSON","k","","c",True,{}),
    ("","","STRING","JSON","","sel","c",True,{}),
    ("","","STRING","JSON","weird key","","c",True,{}),
    ("","","STRING","JSON","$.bad","","c",True,{}),
    ("","","STRING","CSV","","3","c",True,{}),
    ("","","STRING","CSV","src","2","c",True,{}),
    ("","","INT","CSV","","","col2",True,{"col2":5}),
    ("","","DECIMAL(10,2)","","field","","c",True,{}),
    ("","","string","","","","c",True,{}),
    ("","","TIMESTAMP(3)","","f","","c",True,{}),
    ("OVR","STX","STRING","","SF","","TC",False,{}),
    ("","STX","STRING","","SF","","TC",False,{}),
    ("","","STRING","","SF","","TC",False,{}),
    ("","","STRING","","","","TC",False,{}),
    ("","","STRING","","","","",False,{})]
paths = [("$.a.b",""),("field",""),("weird key",""),("","fallback"),("",""),
         ('a"b',""),("$['x']",""),("_f1",""),("9lead",""),("a.b","")]
preds = ["WHERE status = 'A'","  AND id = 5 ;;;","","or x=1","  OR  y = 2  ",
         "WHEREABOUTS = 1","ANDROID = 2",";;;","a = 1;; ","WHERE WHERE x"]

got = {}
for line in open(sys.argv[1]):
    m = re.match(r'(REWRITE|EXPR|PATH|PRED)(\d+)<<<(.*)>>>$', line.strip(), re.DOTALL)
    if m:
        got[(m.group(1), int(m.group(2)))] = m.group(3)

mm = total = 0
def check(kind, i, py):
    global mm, total
    total += 1
    if got.get((kind, i)) != py:
        mm += 1
        print(f"MISMATCH {kind}{i}: py={py!r} scala={got.get((kind,i))!r}")

for i, c in enumerate(rewrites):
    check("REWRITE", i, rewrite_predicate_as_json(c, "val"))
for i, (ov, stx, tgt, mf, sf, fsel, tc, isview, idx) in enumerate(expr_cases):
    row = {"ExprOverride": ov, "SourceTransformExpr": stx, "TargetDataType": tgt,
           "MessageFormat": mf, "SourceField": sf, "FieldSelector": fsel,
           "TargetColumn": tc}
    check("EXPR", i, choose_expr(row, isview, "payload", "|", idx))
for i, (s, f) in enumerate(paths):
    check("PATH", i, _json_path(s, f))
for i, p in enumerate(preds):
    check("PRED", i, sanitize_predicate(p))
print(f"{mm} mismatches over {total} cases")
sys.exit(1 if mm else 0)

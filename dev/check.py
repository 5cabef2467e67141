#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet,
run oracle_sql.json in DuckDB over the same sf dir, compare (schema-ish, rows,
values). Usage: python3 dev/check.py [--json out.json] <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

args = sys.argv[1:]
json_out = None
if args and args[0] == "--json":
    json_out = args[1]
    args = args[2:]
sfdir, outdir = args[0], args[1]
record = {}
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
only = set(args[2:])
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
def compare(name, sql):
    """Returns (ok, rows_or_None, detail)."""
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        return False, None, "no spark output dir"
    try:
        got = pd.read_parquet(qdir)
    except Exception as e:
        return False, None, f"read spark output: {e}"
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        return False, len(got), f"oracle sql error: {e}"
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        return False, len(got), f"columns {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, len(got), f"rows {len(got)} vs {len(want)}"
    # normalize tz-aware → naive for compare
    for c in got.columns:
        for df in (got, want):
            if str(df[c].dtype).startswith("datetime64") and getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
    bad = []
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            eq = (a.astype(object).where(pd.notna(a), None) ==
                  b.astype(object).where(pd.notna(b), None))
            neq = (~eq) & ~(pd.isna(a) & pd.isna(b))
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r} ({neq.sum()} diffs)")
        except Exception as e:
            bad.append(f"{c}: compare error {e}")
    if bad:
        return False, len(got), "; ".join(bad[:3])
    return True, len(got), ""

fails = 0
for name, sql in sorted(oracle.items()):
    ok, rows, detail = compare(name, sql)
    record[name] = {"ok": ok, "rows": rows}
    if detail:
        record[name]["detail"] = detail
    if ok:
        print(f"OK   {name} ({rows} rows)")
    else:
        print(f"FAIL {name}: {detail}"); fails += 1
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sfdir, "n_oracle": len(oracle),
                   "n_pass": len(oracle) - fails, "queries": record}, f, indent=1)
print(f"\n{len(oracle)-fails}/{len(oracle)} queries pass")
sys.exit(1 if fails else 0)

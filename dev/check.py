#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet,
run oracle_sql.json in DuckDB over the same sf dir, compare (schema-ish, rows,
values). Usage: python3 dev/check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
only = set(sys.argv[3:])
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = 0
for name, sql in sorted(oracle.items()):
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = pd.read_parquet(qdir)
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
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
        print(f"FAIL {name}: " + "; ".join(bad[:3])); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries pass")
sys.exit(1 if fails else 0)

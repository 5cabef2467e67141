#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet,
run oracle_sql.json in DuckDB over the same sf dir, compare (schema-ish, rows,
values). Usage: python3 dev/check.py [--json out.json] <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

args = sys.argv[1:]
json_out = None
driver_out = None
while args and args[0] in ("--json", "--driver-json"):
    if args[0] == "--json":
        json_out = args[1]
    else:
        driver_out = args[1]
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
# driver[name] mirrors the round harness's own artifact schema exactly
# (per-query rows_match/schema_match/hash_match/spark_rows/oracle_rows/err,
# see CORRECTNESS_r05.json) so dev/gate.py can publish it under the
# driver's CORRECTNESS_r{N}.json path when the driver-side collection
# fails (VERDICT r08 "Next round" #2; it came back `{}` rounds 6-8).
driver = {}


def compare(name, sql):
    """Returns (ok, rows_or_None, detail); fills driver[name]."""
    d = driver[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": None,
                        "oracle_rows": None, "err": None}
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        d["err"] = "no spark output dir"
        return False, None, "no spark output dir"
    try:
        got = pd.read_parquet(qdir)
    except Exception as e:
        d["err"] = f"read spark output: {e}"
        return False, None, f"read spark output: {e}"
    d["spark_rows"] = len(got)
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        d["err"] = f"oracle sql error: {e}"
        return False, len(got), f"oracle sql error: {e}"
    d["oracle_rows"] = len(want)
    d["rows_match"] = len(got) == len(want)
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    d["schema_match"] = list(got.columns) == list(want.columns)
    if not d["schema_match"]:
        return False, len(got), f"columns {list(got.columns)} vs {list(want.columns)}"
    if not d["rows_match"]:
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
        d["err"] = "; ".join(bad[:3])
        return False, len(got), d["err"]
    d["hash_match"] = True
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
if driver_out:
    # include the dumped-but-oracle-less queries as rows-only entries, the
    # driver's own convention for them (err: "no_oracle")
    if not only:
        for qdir in sorted(glob.glob(f"{outdir}/q_*")):
            name = os.path.basename(qdir)
            if name in driver or not os.path.isdir(qdir):
                continue
            try:
                rows = len(pd.read_parquet(qdir))
            except Exception:
                rows = None
            driver[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": rows,
                            "oracle_rows": None, "err": "no_oracle"}
    with open(driver_out, "w") as f:
        json.dump(dict(sorted(driver.items())), f, indent=1)
print(f"\n{len(oracle)-fails}/{len(oracle)} queries pass")
sys.exit(1 if fails else 0)

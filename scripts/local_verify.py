#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate: reads each
outDir/<name> parquet (Spark result), runs outDir/oracle_sql.json in DuckDB
over the sfDir parquet tables, and compares row/schema/values.

Usage: local_verify.py <sfDir> <outDir>
(Dev tool only — not part of the shipped library.)
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, okc = [], 0
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        fails.append((name, "no spark output")); continue
    try:
        got = con.execute(
            f"SELECT * FROM parquet_scan('{pdir}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {str(e)[:200]}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"cols {list(got.columns)} vs {list(exp.columns)}")); continue
    # strict type agreement (a type-sensitive driver hash would catch these)
    sp_t = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM parquet_scan('{pdir}/*.parquet')").fetchall()}
    du_t = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    badtypes = [(c, sp_t[c], du_t[c]) for c in sp_t if c in du_t and sp_t[c] != du_t[c]]
    if badtypes:
        fails.append((name, f"type mismatch {badtypes}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} vs {len(exp)}")); continue
    ok = True
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        if gv != ev:
            bad = next((i, gv[i], ev[i]) for i in range(len(gv)) if gv[i] != ev[i])
            fails.append((name, f"col {c} mismatch at row {bad[0]}: {bad[1]!r} vs {bad[2]!r} "
                                f"(types {type(bad[1]).__name__}/{type(bad[2]).__name__})"))
            ok = False
            break
    if ok:
        okc += 1
        print(f"OK   {name} ({len(got)} rows)")
for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{okc}/{len(oracle)} queries match")
sys.exit(0 if not fails else 1)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify at a given SF (default sf0.01), then executes each
oracle_sql.json query in DuckDB over the same parquet tables and
compares: schema (column names sorted), row count, and values
(rows sorted, doubles rounded to 9dp before compare).

Usage: python3 tools/check.py [sfDir] [--skip-verify] [--out=DIR]

--out=DIR points at an alternate Verify dump (the subset-gate loop:
run graft.Verify with a key list into its own dir, then compare just
those keys with --skip-verify --out=thatdir).
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/root/repo/target/graft_verify"
for a in sys.argv[1:]:
    if a.startswith("--out="):
        OUT = a.split("=", 1)[1]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:]); sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

def norm(rows):
    out = []
    for row in rows:
        out.append(tuple(
            round(v, 9) if isinstance(v, float) else
            (str(v) if not isinstance(v, (int, float, type(None))) else v)
            for v in row))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))

fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{OUT}/{name}"
    if not Path(pq).exists():
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got_df = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    try:
        exp_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    g_cols, e_cols = sorted(got_df.columns), sorted(exp_df.columns)
    if g_cols != e_cols:
        print(f"FAIL {name}: cols {g_cols} != {e_cols}"); fails += 1; continue
    # dtype parity (a stricter driver may hash typed values)
    g_types = dict(zip(got_df.columns, (str(t) for t in got_df.dtypes)))
    e_types = dict(zip(exp_df.columns, (str(t) for t in exp_df.dtypes)))
    mism = {c: (g_types[c], e_types[c]) for c in g_types
            if g_types[c] != e_types[c]}
    if mism:
        print(f"WARN {name}: dtype mismatch {mism}")
    got = norm(got_df[g_cols].itertuples(index=False, name=None))
    exp = norm(exp_df[e_cols].itertuples(index=False, name=None))
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    if got != exp:
        diffs = [(a, b) for a, b in zip(got, exp) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. {diffs}"); fails += 1; continue
    print(f"ok   {name} ({len(got)} rows)")

extra = set(oracle) - {p.name for p in Path(OUT).iterdir() if p.is_dir()}
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)

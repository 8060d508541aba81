#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, values rounded-ish compare).

Usage: python3 scripts/verify_local.py [sfdir] [outdir]
(Driver-side tooling only — not part of the shipped library.)
"""
import json, math, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SKIP_RUN = os.environ.get("SKIP_RUN") == "1"

if not SKIP_RUN:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.10g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return out

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    res_dir = f"{OUT}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result"); n_fail += 1; continue
    try:
        spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        s_cols = spark_rel.columns
        s_rows = spark_rel.fetchall()
        duck_rel = con.sql(sql)
        d_cols = duck_rel.columns
        d_rows = duck_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    if sorted(s_cols) != sorted(d_cols):
        print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        n_fail += 1; continue
    s_types = dict(zip(s_cols, [str(t) for t in spark_rel.types]))
    d_types = dict(zip(d_cols, [str(t) for t in duck_rel.types]))
    tmismatch = {c: (s_types[c], d_types[c]) for c in s_cols
                 if s_types[c] != d_types[c]}
    if tmismatch:
        print(f"WARN {name}: dtype mismatch {tmismatch}")
    cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
    if len(cs) != len(cd):
        print(f"FAIL {name}: rows spark={len(cs)} duck={len(cd)}"); n_fail += 1; continue
    bad = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
    if bad:
        i = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(cs)} rows differ; first at {i}:")
        print(f"  spark: {cs[i]}")
        print(f"  duck : {cd[i]}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(cs)} rows)"); n_pass += 1

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)

#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same testdata parquet and compare schema/rows/values.

Dev tool only (driver-side python is available in this container); the
shipped engine is pure Scala/Spark.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        continue
    # driver sorts columns by name before hashing values
    eidx = [i for _, i in sorted((c, i) for i, c in enumerate(exp_cols))]
    gidx = [i for _, i in sorted((c, i) for i, c in enumerate(got_cols))]
    if sorted(exp_cols) != sorted(got_cols):
        print(f"FAIL {name}: columns differ: oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
        fails += 1
        continue
    e_rows = [tuple(norm(r[i]) for i in eidx) for r in exp]
    g_rows = [tuple(norm(r[i]) for i in gidx) for r in got]
    if e_rows == g_rows:
        print(f"OK   {name}: {len(e_rows)} rows")
    elif sorted(map(repr, e_rows)) == sorted(map(repr, g_rows)):
        print(f"WARN {name}: rows match only after re-sort ({len(e_rows)} rows) — fix ORDER BY")
        fails += 1
    else:
        print(f"FAIL {name}: values differ ({len(e_rows)} oracle vs {len(g_rows)} spark rows)")
        only_e = [r for r in e_rows if r not in g_rows][:3]
        only_g = [r for r in g_rows if r not in e_rows][:3]
        print(f"     oracle-only: {only_e}")
        print(f"     spark-only : {only_g}")
        fails += 1

# rows-only queries (no oracle): check parquet exists and rows>0
import glob, os
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle:
        continue
    try:
        n = con.execute(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only, {n} rows")
        fails += 0 if n > 0 else 1
    except Exception as e:
        print(f"FAIL {name}: rows-only unreadable: {e}")
        fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

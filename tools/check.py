#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]
Reads <outDir>/<name>/ parquet (Spark output) and <outDir>/oracle_sql.json,
runs each oracle in DuckDB over <sfDir>/*.parquet tables, compares:
column names (sorted), row count, and cell values (sorted rows, rounded
floats). Prints PASS/FAIL per query.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
# events ts: nanos -> microsecond timestamp to match Spark-side truncation
if os.path.exists(f"{sfdir}/events.parquet"):
    cols = con.execute("SELECT * FROM events LIMIT 0").df().columns
    con.execute("DROP VIEW events")
    con.execute(f"CREATE VIEW events AS SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM read_parquet('{sfdir}/events.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)): return "[" + ",".join(norm(x) for x in v) + "]"
        try:
            import numpy as np
            if isinstance(v, np.ndarray): return "[" + ",".join(norm(x) for x in v.tolist()) + "]"
            if isinstance(v, np.floating):
                fv = float(v)
                return "NaN" if math.isnan(fv) else f"{fv:.6g}"
            if isinstance(v, np.integer): return str(int(v))
            if v is pd.NaT: return "NULL"
        except ImportError: pass
        if isinstance(v, dict): return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
        if pd.isna(v) if not isinstance(v, (list, dict)) else False: return "NULL"
        return str(v)
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows), list(df.columns)

npass = nfail = 0
fails = []
for name in sorted(oracles):
    if only and name not in only: continue
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result"); nfail += 1; fails.append(name); continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: read spark result: {e}"); nfail += 1; fails.append(name); continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); nfail += 1; fails.append(name); continue
    srows, scols = canon(spark_df)
    orows, ocols = canon(oracle_df)
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); nfail += 1; fails.append(name); continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); nfail += 1; fails.append(name); continue
    if srows != orows:
        bad = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}"); nfail += 1; fails.append(name); continue
    print(f"PASS {name} ({len(srows)} rows)"); npass += 1

# rows-only queries: check >0 rows
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = os.path.basename(d)
    if name in oracles or (only and name not in only): continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    status = "PASS" if n > 0 else "FAIL"
    print(f"{status} {name} (rows-only, {n} rows)")
    if n > 0: npass += 1
    else: nfail += 1; fails.append(name)

print(f"\n{npass} pass, {nfail} fail")
if fails: print("failing:", " ".join(fails))
sys.exit(1 if nfail else 0)

#!/usr/bin/env python3
"""Export the head-to-head tables from testdata parquet to the JSON
arrays the reference engine loads (tools/ref_bench.mjs /
ref_bench20.mjs read /tmp/refdata/*.json).

TIMESTAMP columns export as ISO-T strings ('1998-09-02T00:00:00') —
EXACTLY the format graft.tools.HeadToHead applies on the Spark side
(date_format yyyy-MM-dd'T'HH:mm:ss), so both engines run their string
comparisons over identical values.

Usage: export_refdata.py [sf_dir] [out_dir]
"""
import os
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/refdata"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

for t in ["lineitem", "orders", "customer", "nation"]:
    src = f"{sf}/{t}.parquet"
    cols = []
    for name, typ, *_ in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall():
        if typ.startswith("TIMESTAMP"):
            cols.append(f"strftime(\"{name}\", '%Y-%m-%dT%H:%M:%S') AS \"{name}\"")
        else:
            cols.append(f'"{name}"')
    path = f"{out}/{t}.json"
    con.execute(f"COPY (SELECT {', '.join(cols)} FROM '{src}') TO '{path}' (FORMAT JSON, ARRAY true)")
    n = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
    print(f"[refdata] {t}: {n} rows -> {path}")

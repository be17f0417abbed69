#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles against DuckDB, approximating the
driver's compare: for each query, read the Spark result parquet and the
DuckDB oracle result, sort columns by name, canonicalize values, and diff."""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if isinstance(v, bytes): return v.hex()
    return v

fails = []
for name in sorted(oracles):
    if only and name not in only: continue
    sql = oracles[name]
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    spark = pq.read_table(files)
    dcols, scols = sorted(duck.column_names), sorted(spark.column_names)
    if dcols != scols:
        fails.append((name, f"cols differ: duck={dcols} spark={scols}")); continue
    if duck.num_rows != spark.num_rows:
        fails.append((name, f"rows differ: duck={duck.num_rows} spark={spark.num_rows}")); continue
    drows = [tuple(canon(duck.column(c)[i].as_py()) for c in dcols) for i in range(duck.num_rows)]
    srows = [tuple(canon(spark.column(c)[i].as_py()) for c in scols) for i in range(spark.num_rows)]
    # compare as multisets AND in order
    if sorted(map(repr, drows)) != sorted(map(repr, srows)):
        diffs = [(a, b) for a, b in zip(drows, srows) if a != b][:3]
        fails.append((name, f"values differ, first diffs: {diffs}")); continue
    # schema types (arrow-level) for awareness, not failure
    dt = {c: str(duck.schema.field(c).type) for c in dcols}
    st = {c: str(spark.schema.field(c).type) for c in scols}
    note = "" if dt == st else f"  [type note: { {c:(dt[c],st[c]) for c in dcols if dt[c]!=st[c]} }]"
    print(f"OK   {name} ({duck.num_rows} rows){note}")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracles) - len(fails)}/{len(oracles)} matched")
sys.exit(1 if fails else 0)

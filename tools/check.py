#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify to dump
each SparkEntry query to parquet + oracle_sql.json, then run every oracle SQL
in DuckDB against the same testdata tables and compare (sorted columns,
sorted rows, exact values after the engine-side rounding)."""
import sys, json, math, subprocess
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, bytes): return v.hex()
    return repr(v)

def compare(name, sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    try:
        oracle = con.execute(sql).fetchdf()
    except Exception as e:
        return f"ORACLE-ERROR {e}"
    try:
        got = duckdb.connect().execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        return f"SPARK-MISSING {e}"
    o_cols = sorted(oracle.columns)
    g_cols = sorted(got.columns)
    if o_cols != g_cols:
        return f"SCHEMA cols spark={g_cols} oracle={o_cols}"
    o = oracle[o_cols]
    g = got[g_cols]
    if len(o) != len(g):
        return f"ROWS spark={len(g)} oracle={len(o)}"
    o_rows = sorted(tuple(norm(v) for v in row) for row in o.itertuples(index=False))
    g_rows = sorted(tuple(norm(v) for v in row) for row in g.itertuples(index=False))
    if o_rows != g_rows:
        diff = [(a, b) for a, b in zip(o_rows, g_rows) if a != b][:3]
        return f"HASH first-diffs (oracle, spark): {diff}"
    return "OK"

def main():
    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    for name, sql in sorted(oracles.items()):
        if ONLY and name not in ONLY: continue
        results[name] = compare(name, sql)
        print(f"{name:28s} {results[name]}")
    bad = {k: v for k, v in results.items() if v != "OK"}
    print(f"\n{len(results) - len(bad)}/{len(results)} OK")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()

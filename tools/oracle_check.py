#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Reads target/verify_out/<name>/ parquet (Spark result) and runs the
matching oracle SQL from target/verify_out/oracle_sql.json in DuckDB over
the sf parquet tables, then compares schema + row values exactly
(columns sorted by name, like the driver).

Usage: python3 tools/oracle_check.py [sfDir] [outDir]
"""
import sys, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(p.split("/")[-1] for p in glob.glob(f"{out}/*") if not p.endswith(".json"))

fails = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name:30s} NO SPARK OUTPUT"); fails += 1; continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name:30s} rows-only: {len(spark_df)} rows"); continue
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:30s} ORACLE SQL ERROR: {e}"); fails += 1; continue
    s = spark_df[sorted(spark_df.columns)]
    o = ora_df[sorted(ora_df.columns)]
    if list(s.columns) != list(o.columns):
        print(f"{name:30s} SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
        fails += 1; continue
    if len(s) != len(o):
        print(f"{name:30s} ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}")
        fails += 1; continue
    # value compare, tolerant of dtype wrappers (compare as python objects)
    bad = None
    sv, ov = s.values.tolist(), o.values.tolist()
    for i, (a, b) in enumerate(zip(sv, ov)):
        if [str(x) for x in a] != [str(x) for x in b]:
            bad = (i, a, b); break
    if bad:
        print(f"{name:30s} VALUE MISMATCH at row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
        fails += 1
    else:
        print(f"{name:30s} OK ({len(s)} rows)")
missing = set(oracle) - set(names)
if missing:
    print("oracle entries without spark output:", missing); fails += 1
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir, loads the Spark parquet result,
runs the matching oracle SQL (oracle_sql.json) in DuckDB with the sf_dir
tables registered as views, sorts columns by name and rows by all columns,
then compares row count, column names, and exact values.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    return repr(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        spark = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark)} rows)")
            n_skip += 1
            continue
        try:
            ora = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(spark.columns), sorted(ora.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: schema {s_cols} vs {o_cols}")
            n_fail += 1
            continue
        if len(spark) != len(ora):
            print(f"FAIL {name}: rows {len(spark)} vs {len(ora)}")
            n_fail += 1
            continue
        s = spark[s_cols].astype(object)
        o = ora[s_cols].astype(object)
        s_rows = sorted(tuple(norm(v) for v in r) for r in s.values)
        o_rows = sorted(tuple(norm(v) for v in r) for r in o.values)
        if s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skipped (no oracle)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

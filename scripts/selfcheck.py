#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library has no Python dependency).

Usage: python3 scripts/selfcheck.py [sfDir] [outDir]

Runs DuckDB on each oracle_sql.json entry against the parquet tables in
sfDir, loads the Spark result parquet written by graft.Verify from
outDir, sorts columns by name and rows by all columns, and compares
values exactly. Prints per-query PASS/FAIL.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "target/verify_out")

oracle = json.loads((out_dir / "oracle_sql.json").read_text())

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


# optional third arg: comma-separated query-name substrings to check
# (e.g. "q63,q75") — the full sweep at sf0.1 spends most of its time in
# the deliberately-quadratic oracle anchors, so targeted re-checks of
# just-changed queries need a filter
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

n_pass = n_fail = 0
for qdir in sorted(out_dir.iterdir()):
    if not qdir.is_dir():
        continue
    name = qdir.name
    if only is not None and not any(s in name for s in only):
        continue
    spark_df = duckdb.connect().execute(
        f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={len(spark_df)}")
        continue
    try:
        oracle_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE-SQL-ERROR {e}")
        n_fail += 1
        continue
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}")
        n_fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"{name}: PASS rows={len(a)}")
        n_pass += 1
    except AssertionError as e:
        print(f"{name}: VALUE-MISMATCH {str(e)[:400]}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)

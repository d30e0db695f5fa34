#!/usr/bin/env python3
"""Local driver-mimic: run SparkEntry.oracleSql (dumped by Verify as
oracle_sql.json) in DuckDB against the sf tables + committed _input_*
parquet, and compare against the Spark query outputs the way the
driver does (sorted columns, sorted rows, exact values)."""
import json
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gv001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    try:
        sdf = pd.read_parquet(f"{OUT_DIR}/{name}")
    except Exception as e:
        print(f"{name}: spark output read error: {e}")
        fails.append(name)
        continue
    rows = (len(odf) == len(sdf))
    cols = sorted(odf.columns) == sorted(sdf.columns)
    status = []
    if not rows:
        status.append(f"rows spark={len(sdf)} oracle={len(odf)}")
    if not cols:
        status.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    equal = False
    if rows and cols:
        a, b = canon(sdf), canon(odf)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            equal = True
        except AssertionError as e:
            msg = str(e).split("\n")[0:3]
            status.append("values differ: " + " | ".join(msg))
            # show a sample diff
            for c in a.columns:
                if not a[c].equals(b[c]):
                    neq = a[c] != b[c]
                    status.append(
                        f"  col {c}: {neq.sum()} diffs; "
                        f"spark={a[c][neq].head(3).tolist()} oracle={b[c][neq].head(3).tolist()}")
    if rows and cols and equal:
        print(f"{name}: OK ({len(sdf)} rows)")
    else:
        print(f"{name}: FAIL " + "; ".join(status))
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracles green; fails: {fails}")

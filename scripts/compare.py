#!/usr/bin/env python3
"""Dev-only harness that mimics the driver's t2 oracle check.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
testdata parquet tables, reads the Spark result parquet written by
graft.Verify, and compares (columns sorted by name, rows sorted by all
columns, exact values). NOT part of the engine — development tooling only.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ora = con.execute(sql)
            ora_cols = [d[0] for d in ora.description]
            ora_rows = ora.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            continue
        if sorted(ora_cols) != sorted(sp_cols):
            print(f"FAIL {name}: columns differ\n  oracle: {sorted(ora_cols)}\n  spark : {sorted(sp_cols)}")
            continue
        a, b = rows_key(ora_rows, ora_cols), rows_key(sp_rows, sp_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: row counts differ oracle={len(a)} spark={len(b)}")
            continue
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for x, y in bad:
                print(f"  oracle: {x}\n  spark : {y}")
            continue
        n_ok += 1
        print(f"OK   {name} ({len(a)} rows)")
    print(f"== {n_ok}/{len(oracle)} matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

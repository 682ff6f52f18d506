#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 compare *pandas path*.

The driver (unlike scripts/compare.py, which uses fetchall → Python ints)
loads both result sets into pandas DataFrames, sorts by all columns, and
hash-compares values. That path has two traps compare.py cannot see:

  1. DuckDB HUGEINT (e.g. sum(BIGINT), list_sum(BIGINT[])) converts to
     float64 in .df(), while the Spark parquet int64 stays int64 →
     "26.0" vs "26" hash mismatch, and >2^53 values silently lose bits.
  2. Array/list columns become numpy.ndarray cells, which
     DataFrame.sort_values cannot factorize → the compare crashes.

Run this (not just compare.py) before claiming a query green.

Usage: python3 scripts/compare_pandas.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ora = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            continue
        if sorted(ora.columns) != sorted(sp.columns):
            print(f"FAIL {name}: columns differ\n"
                  f"  oracle: {sorted(ora.columns)}\n"
                  f"  spark : {sorted(sp.columns)}")
            continue
        cols = sorted(ora.columns)
        try:
            a = ora[cols].sort_values(cols).reset_index(drop=True)
            b = sp[cols].sort_values(cols).reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: pandas sort crashed (driver errs too): {e}")
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: row counts differ "
                  f"oracle={len(a)} spark={len(b)}")
            continue
        # dtype-sensitive stringification: float64 "26.0" vs int64 "26"
        # must FAIL here, because it fails in the driver's hash
        av, bv = a.astype(str), b.astype(str)
        if not av.equals(bv):
            diff = (av != bv)
            bad_cols = [c for c in cols if diff[c].any()]
            print(f"FAIL {name}: values differ in {bad_cols}; first diffs:")
            shown = 0
            for i in range(len(a)):
                if diff.iloc[i].any() and shown < 3:
                    print(f"  row {i} oracle: "
                          f"{[f'{c}={av[c][i]}' for c in bad_cols]}")
                    print(f"  row {i} spark : "
                          f"{[f'{c}={bv[c][i]}' for c in bad_cols]}")
                    shown += 1
            continue
        n_ok += 1
        print(f"OK   {name} ({len(a)} rows)")
    print(f"== {n_ok}/{len(oracle)} matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (Spark parquet) and oracle_sql.json, runs each
oracle in DuckDB with views named after the harness tables, sorts columns by
name, and compares row-by-row values exactly (floats: bit-exact unless both
NaN). Prints PASS/FAIL per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM got").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = con.sql(
                f"SELECT {', '.join(want_cols)} FROM want").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            if tuple(map(norm, g)) != tuple(map(norm, w)):
                bad = (i, g, w)
                break
        if bad:
            i, g, w = bad
            print(f"FAIL {name}: row {i} differs\n  spark : {g}\n  duckdb: {w}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

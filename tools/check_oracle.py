#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
sf parquet tables, loads the Spark-written parquet from <outdir>/<name>/,
sorts columns by name on both sides, and compares shapes + values.

Usage: python3 tools/check_oracle.py <sfdir> <outdir> [query...]

NOT part of the shipped library — dev harness only (driver-side python).
"""
import json, sys, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if want.shape != got.shape:
            print(f"FAIL {name}: shape want={want.shape} got={got.shape}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(want)):
            for c in want.columns:
                a, b = canon(want.iloc[i][c]), canon(got.iloc[i][c])
                if a != b:
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a} spark={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows, {len(want.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

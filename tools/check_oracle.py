#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet views, and
compares: column names (sorted), row counts, and exact values (rows sorted,
columns aligned by sorted name). Reports per-query PASS/FAIL.

Driver-side tooling only — NOT part of the Scala library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = list(spark_rel.description and [d[0] for d in spark_rel.description])
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        d_ix = [d_cols.index(c) for c in sorted(d_cols)]
        s_set = sorted(tuple(canon(r[i]) for i in s_ix) for r in s_rows)
        d_set = sorted(tuple(canon(r[i]) for i in d_ix) for r in d_rows)
        if len(s_set) != len(d_set):
            print(f"FAIL {name}: rows spark={len(s_set)} duck={len(d_set)}")
            n_fail += 1
            continue
        if s_set != d_set:
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b]
            print(f"FAIL {name}: {len(diff)} mismatched rows; first: spark={diff[0][0]} duck={diff[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_set)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

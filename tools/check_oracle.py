#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [--json <path>]
For each <name>/ parquet in verify_out_dir, runs oracle_sql.json[name] in
DuckDB over the sf_dir tables and compares (columns sorted by name, rows
sorted, values hashed with light float canonicalization).

--json writes per-query verdicts in the round driver's CORRECTNESS schema
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so the repo can commit a diffable mirror of the official artifact.
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

args = sys.argv[1:]
json_out = None
if "--json" in args:
    i = args.index("--json")
    if i + 1 >= len(args):
        sys.exit("usage: check_oracle.py <verify_out_dir> <sf_dir> [--json <path>]")
    json_out = args[i + 1]
    args = args[:i] + args[i + 2:]
if len(args) < 2:
    sys.exit("usage: check_oracle.py <verify_out_dir> <sf_dir> [--json <path>]")
out_dir, sf_dir = args[0], args[1]
if not os.path.exists(os.path.join(out_dir, "oracle_sql.json")):
    out_dir, sf_dir = sf_dir, out_dir  # accept either arg order
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # bytes (sha256 blobs etc.) → hex string
            if s.map(lambda x: isinstance(x, (bytes, bytearray))).any():
                df[c] = s.map(lambda x: x.hex() if isinstance(x, (bytes, bytearray)) else x)
            else:
                import datetime as _dt
                if s.map(lambda x: isinstance(x, (_dt.date, _dt.datetime)) or x is None).all() and s.notna().any():
                    df[c] = pd.to_datetime(s)
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            df[c] = s.round(6)
        if np.issubdtype(s.dtype, np.datetime64):
            df[c] = s.astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = 0
verdicts = {}
def verdict(name, rows=False, schema=False, hsh=False, sr=None, orr=None, err=None):
    verdicts[name] = {"rows_match": rows, "schema_match": schema,
                      "hash_match": hsh, "spark_rows": sr,
                      "oracle_rows": orr, "err": err}
for name in sorted(oracle):
    qdir = os.path.join(out_dir, name)
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output"); fails += 1
        verdict(name, err="no spark output"); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ORAERR {name}: {e}"); fails += 1
        verdict(name, sr=len(spark_df), err=f"oracle error: {e}"); continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"SCHEMA {name}: spark={list(a.columns)} duck={list(b.columns)}"); fails += 1
        verdict(name, sr=len(a), orr=len(b),
                err=f"schema: spark={list(a.columns)} duck={list(b.columns)}"); continue
    if len(a) != len(b):
        print(f"ROWS  {name}: spark={len(a)} duck={len(b)}"); fails += 1
        verdict(name, schema=True, sr=len(a), orr=len(b), err="row count"); continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
        print(f"OK    {name} ({len(a)} rows)")
        verdict(name, rows=True, schema=True, hsh=True, sr=len(a), orr=len(b))
    except AssertionError as e:
        print(f"DIFF  {name}: {str(e).splitlines()[-1] if str(e) else ''}"); fails += 1
        verdict(name, rows=True, schema=True, sr=len(a), orr=len(b),
                err=f"value diff: {str(e).splitlines()[-1] if str(e) else ''}")
if json_out:
    with open(json_out, "w") as f:
        json.dump(verdicts, f, indent=1, sort_keys=True)
    print(f"[check_oracle] wrote {len(verdicts)} verdicts to {json_out}")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)

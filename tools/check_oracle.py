#!/usr/bin/env python3
"""Emulate the driver's DuckDB oracle compare: sort columns by name,
sort rows, compare values as strings. Usage: check.py OUT_DIR SF_DIR"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
sql = json.load(open(f"{out_dir}/oracle_sql.json"))
try:
    errors = json.load(open(f"{out_dir}/errors.json"))
except FileNotFoundError:
    errors = {}

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.astype(str).sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
out_names = {p.rstrip("/").rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*/")}
for name in sorted(set(sql) | set(errors) | out_names):
    if name in errors:
        print(f"{name}: ERR {errors[name][:120]}")
        n_fail += 1
        continue
    if name not in sql:
        print(f"{name}: NO_ORACLE (spark output present, no oracle SQL)")
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output")
        n_fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    ora = con.execute(sql[name]).df()
    s, o = canon(spark_df), canon(ora)
    rows_ok = len(s) == len(o)
    schema_ok = list(s.columns) == list(o.columns)
    hs = hashlib.md5(s.to_csv(index=False).encode()).hexdigest()
    ho = hashlib.md5(o.to_csv(index=False).encode()).hexdigest()
    ok = rows_ok and schema_ok and hs == ho
    n_pass += ok
    n_fail += not ok
    tag = "OK" if ok else f"FAIL rows={len(s)}/{len(o)} schema={schema_ok} hash={hs == ho}"
    print(f"{name}: {tag}")
print(f"== {n_pass} pass, {n_fail} fail ==")
sys.exit(1 if n_fail else 0)

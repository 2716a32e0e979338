#!/usr/bin/env python3
"""Dev-only harness: pre-verify SparkEntry oracles the way the driver does.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, and compares: schema (sorted column names), row count, and values
(columns sorted by name, rows sorted by all columns, floats rounded).
This file is a development tool only — the engine itself is pure Scala/Spark.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "int" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            n_fail += 1; continue
        if not got.equals(want):
            neq = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; first:")
            idx = neq.idxmax()
            print("  spark:", got.loc[idx].to_dict())
            print("  duck :", want.loc[idx].to_dict())
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

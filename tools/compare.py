#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
Loads each <out>/<name> parquet, runs oracle_sql.json[name] in DuckDB with
the sf tables registered as views, sorts columns by name and rows by all
columns, and compares values (exact; NaN==NaN allowed).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1]
out = sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), na_position="first",
                          kind="mergesort").reset_index(drop=True)

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails.append(name); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}"); fails.append(name); continue
    s, o = canon(spark_df), canon(odf)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA {list(s.columns)} vs {list(o.columns)}")
        fails.append(name); continue
    if len(s) != len(o):
        print(f"{name}: ROWS {len(s)} vs {len(o)}"); fails.append(name); continue
    ok = True
    for c in s.columns:
        sv, ov = s[c].values, o[c].values
        if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
            import numpy as np
            svf = pd.to_numeric(s[c]).values.astype(float)
            ovf = pd.to_numeric(o[c]).values.astype(float)
            neq = ~((svf == ovf) | (pd.isna(svf) & pd.isna(ovf)))
            if neq.any():
                ok = False
                idx = list(neq.nonzero()[0][:5])
                print(f"{name}: VALUE diff col={c} n={neq.sum()} e.g. rows {idx}")
                for i in idx[:3]:
                    print(f"   spark={s.iloc[i].to_dict()}")
                    print(f"   orcl ={o.iloc[i].to_dict()}")
        else:
            neq = ~((sv == ov) | (pd.isna(s[c]).values & pd.isna(o[c]).values))
            if neq.any():
                ok = False
                print(f"{name}: VALUE diff col={c} n={neq.sum()}")
    if ok:
        print(f"{name}: OK ({len(s)} rows)")
    else:
        fails.append(name)

print(f"\n{len(oracle if not only else only)-len(fails)} ok, {len(fails)} fail: {fails}")

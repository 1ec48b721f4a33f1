#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle SQL in DuckDB over views named after the parquet tables, then
compares: schema (column names), row count, and exact values after
sorting columns by name and rows by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # unify dtypes a bit: times->ns, categories->str
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"{name:24s} MISSING spark output"); fails.append(name); continue
    got = pd.read_parquet(spark_path)
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}"); fails.append(name); continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"{name:24s} SCHEMA got={list(g.columns)} exp={list(e.columns)}"); fails.append(name); continue
    if len(g) != len(e):
        print(f"{name:24s} ROWS got={len(g)} exp={len(e)}"); fails.append(name); continue
    # The driver hashes FORMATTED values, so an int64 Spark column vs a
    # float64 oracle column (DuckDB HUGEINT sums -> float64) hash-mismatches
    # even when numerically equal. Fail on any int-vs-float dtype split.
    dtype_bad = [c for c in g.columns
                 if {g[c].values.dtype.kind, e[c].values.dtype.kind} == {'i', 'f'}
                 or {g[c].values.dtype.kind, e[c].values.dtype.kind} == {'u', 'f'}]
    if dtype_bad:
        for c in dtype_bad:
            print(f"{name:24s} DTYPE col={c} spark={g[c].values.dtype} oracle={e[c].values.dtype}"
                  f" (driver hashes formatted values: cast the oracle, e.g. CAST(SUM(..) AS BIGINT))")
        fails.append(name); continue
    bad = None
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            eq = (pd.isna(gv) & pd.isna(ev)) | (gv == ev)
        else:
            try:
                eq = (gv == ev) | (pd.isna(gv) & pd.isna(ev))
            except Exception:
                eq = np.array([str(a) == str(b) for a, b in zip(gv, ev)])
        if not np.all(eq):
            i = int(np.argmin(eq))
            bad = (c, i, gv[i], ev[i], int((~eq).sum()))
            break
    if bad:
        c, i, a, b, n = bad
        print(f"{name:24s} VALUES col={c} ndiff={n} e.g. row{i}: got={a!r} exp={b!r}")
        fails.append(name)
    else:
        print(f"{name:24s} OK ({len(g)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK; failing: {fails}")

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Reads each Verify output parquet at OUT_DIR/<name>/, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf tables, and
compares: schema (column names), row count, and values (exact + at
rounded precision, to surface float last-ulp drift separately from
real bugs).

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fail = 0
for name in sorted(oracle):
    res_path = f"{out_dir}/{name}"
    if not glob.glob(f"{res_path}/*.parquet"):
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = canon(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{res_path}/*.parquet"))]))
    try:
        exp = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fail += 1
        continue
    exact_ok, round_ok, maxdiff = True, True, 0.0
    for c in got.columns:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            g = g.astype(float); e = e.astype(float)
            d = np.abs(g.values - e.values)
            rel = d / np.maximum(np.abs(e.values), 1e-12)
            m = np.nanmax(rel) if len(rel) else 0.0
            maxdiff = max(maxdiff, float(m))
            if not np.allclose(g.values, e.values, rtol=0, atol=0, equal_nan=True):
                exact_ok = False
            if not np.allclose(g.values, e.values, rtol=1e-9, equal_nan=True):
                round_ok = False
        else:
            gs, es = g.astype(str), e.astype(str)
            if not (gs.values == es.values).all():
                exact_ok = round_ok = False
                bad = np.where(gs.values != es.values)[0][:3]
                print(f"  {name}.{c} sample diff: {[(gs.values[i], es.values[i]) for i in bad]}")
    if round_ok:
        tag = "OK(exact)" if exact_ok else f"OK(float~{maxdiff:.2e})"
        print(f"PASS {name}: {len(got)} rows {tag}")
    else:
        print(f"FAIL {name}: value mismatch (max rel float diff {maxdiff:.2e})")
        fail += 1
print("----")
sys.exit(1 if fail else 0)

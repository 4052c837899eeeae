#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts columns by
name and rows by all columns, and compares values exactly (with a float
tolerance report so we can see HOW far off a mismatch is).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

with open(f"{outdir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> us, ints -> int64, floats -> float64,
    # list/array cells -> tuples (hashable/sortable)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
results = {}
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = pd.read_parquet(d)
    if name not in oracles:
        results[name] = f"NO-ORACLE rows={len(got)}"
        print(f"[noop] {name}: no oracle, rows={len(got)}")
        continue
    try:
        exp = con.sql(oracles[name]).df()
    except Exception as e:
        results[name] = f"ORACLE-ERROR {e}"
        n_fail += 1
        print(f"[FAIL] {name}: oracle SQL error: {e}")
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        n_fail += 1
        results[name] = "SCHEMA-MISMATCH"
        print(f"[FAIL] {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
        continue
    if len(g) != len(e):
        n_fail += 1
        results[name] = f"ROWCOUNT {len(g)} vs {len(e)}"
        print(f"[FAIL] {name}: rows spark={len(g)} oracle={len(e)}")
        continue
    ok = True
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            a, b = g[c].to_numpy(), e[c].to_numpy()
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
            if not eq.all():
                ok = False
                bad = np.where(~eq)[0][:3]
                diff = np.nanmax(np.abs(a - b))
                print(f"[FAIL] {name}.{c}: {int((~eq).sum())}/{len(a)} differ, maxabs={diff}, e.g. rows {bad.tolist()}: {a[bad].tolist()} vs {b[bad].tolist()}")
        else:
            eq = (g[c].astype(str).fillna("<null>") == e[c].astype(str).fillna("<null>"))
            if not eq.all():
                ok = False
                bad = np.where(~eq.to_numpy())[0][:3]
                print(f"[FAIL] {name}.{c}: {int((~eq).sum())}/{len(eq)} differ, e.g. rows {bad.tolist()}: {g[c].iloc[bad].tolist()} vs {e[c].iloc[bad].tolist()}")
    if ok:
        n_pass += 1
        results[name] = f"PASS rows={len(g)}"
        print(f"[pass] {name}: rows={len(g)}")
    else:
        n_fail += 1
        results[name] = "VALUE-MISMATCH"

print(f"\n== {n_pass} pass, {n_fail} fail, {len(results)-n_pass-n_fail} no-oracle ==")
sys.exit(1 if n_fail else 0)

#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness check.

Usage: python3 scripts/local_t2.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf parquet
tables, and compares schema (sorted column names), row count, and
value hash (columns sorted by name).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def h(df: pd.DataFrame) -> str:
    m = hashlib.sha256()
    for c in df.columns:
        for v in df[c].tolist():
            if isinstance(v, float):
                v = repr(round(v, 9))
            m.update(repr(v).encode())
        m.update(b"|col|")
    return m.hexdigest()[:16]

names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
n_pass = n_fail = n_weak = 0
for name in names:
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if name not in oracle:
        status = "WEAK " if len(got) > 0 else "WEAK0"
        if len(got) == 0: n_weak += 1
        print(f"{status} {name}: rows={len(got)} (no oracle)")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL  {name}: cols {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
    if len(g) != len(e):
        print(f"FAIL  {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
    hg, he = h(g), h(e)
    if hg != he:
        print(f"FAIL  {name}: hash mismatch ({len(g)} rows)")
        # show first differing row
        for i in range(len(g)):
            rg, re_ = g.iloc[i].tolist(), e.iloc[i].tolist()
            same = all(
                (repr(round(a,9)) if isinstance(a,float) else repr(a)) ==
                (repr(round(b,9)) if isinstance(b,float) else repr(b))
                for a, b in zip(rg, re_))
            if not same:
                print(f"      first diff row {i}:\n      spark={rg}\n      duck ={re_}")
                break
        n_fail += 1
        continue
    print(f"PASS  {name}: rows={len(g)}")
    n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak-empty, {len(names)} total")
sys.exit(1 if n_fail else 0)

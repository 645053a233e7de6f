#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_outdir>

Reads each <outdir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outdir>/oracle_sql.json in DuckDB against the same
parquet tables, and compares: column names (sorted), row count, and
exact values after sorting rows. Reports per-query PASS/FAIL.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None else "<NULL>")
        elif np.issubdtype(s.dtype, np.floating):
            out[c] = s.astype(np.float64)
        elif np.issubdtype(s.dtype, np.integer):
            out[c] = s.astype(np.int64)
        elif np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.map(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns), kind="mergesort").reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            nfail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            nfail += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            nfail += 1
            continue
        g, e_ = norm(got), norm(exp)
        if list(g.columns) != list(e_.columns):
            print(f"FAIL {name}: cols spark={list(g.columns)} oracle={list(e_.columns)}")
            nfail += 1
            continue
        if len(g) != len(e_):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e_)}")
            nfail += 1
            continue
        neq = (g.values != e_.values)
        # NaN == NaN for our purposes
        for i, c in enumerate(g.columns):
            if g[c].dtype == np.float64:
                both_nan = g[c].isna().values & e_[c].isna().values
                neq[:, i] &= ~both_nan
        if neq.any():
            bad = np.argwhere(neq)
            r, c = bad[0]
            cn = g.columns[c]
            print(f"FAIL {name}: {neq.any(axis=1).sum()} mismatched rows; first: "
                  f"row {r} col {cn}: spark={g.iloc[r, c]!r} oracle={e_.iloc[r, c]!r}")
            nfail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        npass += 1
    print(f"== {npass} pass / {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()

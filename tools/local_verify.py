#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/local_verify.py <outDir> <sfDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers each
parquet table in <sfDir> as a DuckDB view, runs every oracle, and compares
against the Spark result parquet in <outDir>/<name>/. Columns are sorted by
name, rows sorted by all columns. Two passes per query:
  1. tolerant value compare (floats exact, then 1e-9 rtol) -> VALUE errors
  2. strict hash-mirror: dtype KIND must match and every cell must render
     to the same string on both sides -> HASH-* errors. This mirrors the
     driver's type-rendering-sensitive hash gate, so DECIMAL-vs-DOUBLE or
     BIGINT-vs-HUGEINT edges fail HERE before a driver run.
Only OK-EXACT counts as ok; OK-TOL (tolerance-only float match) would fail
the driver hash and is counted bad.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for sorting: convert unhashable cells (lists) to tuples
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except Exception:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str), kind="mergesort")
    return df.reset_index(drop=True)

def compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA MISMATCH got={sorted(got.columns)} exp={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWCOUNT {len(got)} vs {len(exp)}"
    g, e = norm(got), norm(exp)
    # pass 1: tolerant value compare — isolates genuine wrong-answer bugs
    exact = True
    for c in g.columns:
        gv, ev = g[c], e[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            ga = gv.astype(float).to_numpy(); ea = ev.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(ea)
            eq = (ga == ea) | both_nan
            if not eq.all():
                close = np.isclose(ga, ea, rtol=1e-9, atol=1e-12) | both_nan
                if not close.all():
                    i = int(np.argmin(close))
                    return f"VALUE col={c} row={i} got={ga[i]!r} exp={ea[i]!r}"
                exact = False
        else:
            ga = gv.astype(str).to_numpy(); ea = ev.astype(str).to_numpy()
            if not (ga == ea).all():
                i = int(np.argmin(ga == ea))
                return f"VALUE col={c} row={i} got={ga[i]!r} exp={ea[i]!r}"
    if not exact:
        return "OK-TOL(would fail driver hash)"
    # pass 2: strict hash mirror — dtype kinds and rendered cells must be
    # identical, like the driver's hash over rendered values
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind != ev.dtype.kind:
            return (f"HASH-DTYPE col={c} got={gv.dtype} exp={ev.dtype}"
                    " (values equal; edge type differs)")
        ga = gv.map(str).to_numpy(); ea = ev.map(str).to_numpy()
        if not (ga == ea).all():
            i = int(np.argmin(ga == ea))
            return (f"HASH-RENDER col={c} row={i} got={ga[i]!r} exp={ea[i]!r}"
                    " (values equal; rendering differs)")
    return "OK-EXACT"

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    results = {}
    all_queries = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    for name in all_queries:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO OUTPUT FILES"; n_bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(got)}" + (" (EMPTY!)" if len(got)==0 else "")
            n_ok += 1 if len(got) > 0 else 0
            n_bad += 0 if len(got) > 0 else 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            results[name] = f"ORACLE SQL ERROR: {str(ex).splitlines()[0][:160]}"; n_bad += 1; continue
        r = compare(name, got, exp)
        results[name] = r
        if r == "OK-EXACT": n_ok += 1
        else: n_bad += 1
    for k in sorted(results):
        print(f"{k:32s} {results[k]}")
    missing = sorted(set(oracles) - set(all_queries))
    for m in missing:
        print(f"{m:32s} SPARK OUTPUT MISSING"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

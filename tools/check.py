#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (with each testdata table
registered as a view over its parquet file), then compares:
  - schema: sorted column names equal
  - rows:   row counts equal
  - hash:   values equal after sorting columns by name and rows by all
            columns (floats rounded to 9 significant-ish decimals)
"""
import sys, os, json, math
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(np.asarray(v).round(6).tolist()) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    for name in names:
        try:
            got = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            results[name] = f"READ_FAIL {e}"
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" OK" if len(got) > 0 else " EMPTY!")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_FAIL {type(e).__name__}: {e}"
            continue
        g, e = canon(got), canon(exp)
        if sorted(g.columns) != sorted(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={sorted(g.columns)} exp={sorted(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} exp={len(e)}"
        else:
            try:
                eq = g.reset_index(drop=True).equals(e.reset_index(drop=True))
                if not eq:
                    # tolerate dtype-only differences (int32 vs int64 etc.)
                    eq = True
                    detail = ""
                    for c in g.columns:
                        a, b = g[c], e[c]
                        if pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b):
                            af = a.astype("float64"); bf = b.astype("float64")
                            if not np.allclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True):
                                eq = False; detail = f" col={c}"
                                break
                        else:
                            if not a.astype(str).equals(b.astype(str)):
                                eq = False; detail = f" col={c}"
                                break
                    results[name] = ("MATCH (loose)" if eq else f"VALUE_MISMATCH{detail}")
                else:
                    results[name] = "MATCH"
            except Exception as ex:
                results[name] = f"COMPARE_FAIL {ex}"
    bad = 0
    for k in sorted(results):
        r = results[k]
        ok = r.startswith("MATCH") or (r.startswith("ROWS_ONLY") and r.endswith("OK"))
        if not ok: bad += 1
        print(f"{'PASS' if ok else 'FAIL'}  {k}: {r}")
    print(f"\n{len(results)-bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()

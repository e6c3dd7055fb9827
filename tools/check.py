#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify's output (parquet per query + oracle_sql.json) against
DuckDB on the same testdata tables and reports per-query row/schema/value
match. Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # datetime-ish columns → ISO strings so tz/precision quirks don't bite
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_f = pd.to_numeric(av, errors="coerce")
            bv_f = pd.to_numeric(bv, errors="coerce")
            neq = ~((av_f == bv_f) | (av_f.isna() & bv_f.isna()))
            if neq.any():
                diffs = (av_f - bv_f).abs()
                bad.append(f"{c}: {int(neq.sum())} diffs, max|Δ|={diffs.max():.3g}")
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}: {int(neq.sum())} diffs e.g. {av[i]!r} vs {bv[i]!r}")
    return "OK" if not bad else "VALUE MISMATCH " + "; ".join(bad)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_ok = 0
    results = {}
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            continue
        spark_df = pd.read_parquet(pdir)
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:
            results[name] = f"ORACLE ERROR: {str(e).splitlines()[0]}"
        n_ok += results[name] == "OK"
    for name, res in results.items():
        print(f"{'✓' if res == 'OK' else '✗'} {name}: {res}")
    n_oracle = sum(1 for r in results.values() if not r.startswith("NO-ORACLE"))
    print(f"\n{n_ok}/{n_oracle} oracle-checked queries OK; {len(results) - n_oracle} rows-only")
    sys.exit(0 if n_ok == n_oracle else 1)


if __name__ == "__main__":
    main()

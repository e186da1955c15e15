#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet against its DuckDB oracle on the same sf dir.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].apply(lambda v: float(v) if hasattr(v, "as_tuple") else v)
            # Spark DATE columns arrive as python date objects; DuckDB's
            # side comes back datetime64 — compare on a common dtype
            import datetime
            if df[c].apply(lambda v: isinstance(v, datetime.date)).all() and len(df):
                df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int8", "int16", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def rd(path):
    """Read spec for a table that may be ONE parquet file or a DIRECTORY
    of part files (the scale artifacts write directories)."""
    return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM {rd(f'{sf_dir}/{t}.parquet')}")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracles:
            results[name] = f"rows-only: {len(got)} rows"
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        g, w = normalize(got.copy()), normalize(want.copy())
        if list(g.columns) != list(w.columns):
            results[name] = f"SCHEMA MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWCOUNT MISMATCH spark={len(g)} duck={len(w)}"
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            results[name] = "OK"
        except AssertionError as e:
            results[name] = "VALUE MISMATCH: " + str(e).split("\n")[0]
            # show first few diffs
            mask = ~(g.eq(w) | (g.isna() & w.isna())).all(axis=1)
            print(f"--- {name} diffs (spark vs duck):")
            print(g[mask].head(3))
            print(w[mask].head(3))
    bad = 0
    for name, r in sorted(results.items()):
        flag = "✓" if r == "OK" or r.startswith("rows-only") else "✗"
        if flag == "✗":
            bad += 1
        print(f"{flag} {name}: {r}")
    print(f"\n{len(results) - bad}/{len(results)} OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

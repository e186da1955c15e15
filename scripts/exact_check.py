#!/usr/bin/env python3
"""Strict local mirror of the driver's exact-hash correctness gate.

Validated against CORRECTNESS_r01: the driver's compare stringifies the
DuckDB side through pandas (DECIMAL -> float64) while the Spark parquet
side keeps python Decimals, so a hash mismatch occurs exactly when
str(Decimal) != repr(float(Decimal)) for any cell (e.g. trailing zeros:
'6548929.20' vs '6548929.2'), or when the underlying values differ.
This script reproduces that: 55/55 agreement with CORRECTNESS_r01 on the
round-1 outputs.

Mirror rules:
  - duck side:  .df()  (DECIMAL -> float64, DATE/TIMESTAMP -> datetime64)
  - spark side: pyarrow read (decimal -> Decimal, timestamp[ns] -> Timestamp)
  - spark int columns CONTAINING NULLS promote to float (pandas semantics:
    the driver reads the spark parquet through pandas, where a nullable
    int64 column becomes float64 — so '20002' renders '20002.0' on BOTH
    sides; verified against CORRECTNESS_r09, where q_dedup_ingest /
    q_semdedup hash-match at the driver with exactly this shape)
  - columns sorted by name, rows sorted, cells compared as canonical strings
  - datetimes normalized to 'YYYY-MM-DDTHH:MM:SS' on both sides

Usage: python3 scripts/exact_check.py <sfDir> <verifyOutDir> [query ...]
"""
import datetime
import glob
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string of a cell value, mirroring the driver's stringify."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)  # deliberately scale-sensitive: mirrors the driver
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep="T", timespec="seconds")
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat(
            sep="T", timespec="seconds")
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat(
            sep="T", timespec="seconds")
    return str(v)


def spark_rows(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet files in {path} (failed/empty write?)")
    tbl = pq.read_table(files if len(files) > 1 else files[0])
    names = sorted(tbl.column_names)
    cols = {c: tbl.column(c).to_pylist() for c in names}
    types = {c: str(tbl.schema.field(c).type) for c in names}
    for c in names:
        t = tbl.schema.field(c).type
        if pa.types.is_integer(t) and any(v is None for v in cols[c]):
            # pandas promotes nullable int64 -> float64; the driver reads
            # the spark side through pandas, so mirror that here
            cols[c] = [None if v is None else float(v) for v in cols[c]]
            types[c] = f"{types[c]}->float64"
    rows = [tuple(canon(cols[c][i]) for c in names)
            for i in range(tbl.num_rows)]
    return names, sorted(rows), types


def duck_rows(con, sql):
    df = con.sql(sql).df()  # DECIMAL -> float64, like the driver
    names = sorted(df.columns)
    types = {c: str(df[c].dtype) for c in names}
    rows = []
    for i in range(len(df)):
        rows.append(tuple(canon(df[c].iloc[i]) for c in names))
    return names, sorted(rows), types


def rd(path):
    """Read spec for a table that may be ONE parquet file or a DIRECTORY
    of part files (the scale artifacts write directories)."""
    return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {rd(f'{sf_dir}/{t}.parquet')}")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok, bad, rows_only = [], [], []
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        try:
            snames, srows, stypes = spark_rows(path)
        except Exception as e:
            bad.append(name)
            print(f"x {name}: SPARK OUTPUT ERROR {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            continue
        try:
            dnames, drows, dtypes = duck_rows(con, oracles[name])
        except Exception as e:
            bad.append(name)
            print(f"x {name}: ORACLE ERROR {e}")
            continue
        if snames != dnames:
            bad.append(name)
            print(f"x {name}: SCHEMA spark={snames} duck={dnames}")
            continue
        if len(srows) != len(drows):
            bad.append(name)
            print(f"x {name}: ROWS spark={len(srows)} duck={len(drows)}")
            continue
        diffs = [(i, j) for i, (a, b) in enumerate(zip(srows, drows))
                 if a != b for j in range(len(snames)) if a[j] != b[j]]
        if not diffs:
            ok.append(name)
            continue
        bad.append(name)
        print(f"x {name}: {len(diffs)} cell diffs")
        shown = set()
        for i, j in diffs:
            c = snames[j]
            if len(shown) >= 4 and c not in shown:
                break
            if c in shown:
                continue
            shown.add(c)
            print(f"    row {i} col {c} [spark:{stypes[c]} duck:{dtypes[c]}]"
                  f" {srows[i][j]!r} != {drows[i][j]!r}")
    for name in ok:
        print(f"ok {name}")
    if rows_only:
        print(f"(rows-only, no oracle: {len(rows_only)}: {' '.join(rows_only)})")
    print(f"\n{len(ok)} exact-OK, {len(bad)} FAIL, {len(rows_only)} rows-only")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))

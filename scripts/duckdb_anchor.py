#!/usr/bin/env python3
"""Same-scale DuckDB wall-times for the oracle SQL battery.

Runs every query in oracle_sql.json (written by graft.Verify) against
DuckDB over the given testdata SF directory and emits one JSON document
with per-query seconds. This anchors BENCH_r{N}.json to a measured
single-node baseline at the SAME data scale, instead of comparing
against the reference's toy-data compile-latency ceilings.

Usage: python3 scripts/duckdb_anchor.py <sfDir> <oracle_sql.json> [out.json]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def rd(path):
    """Read spec for a table that may be ONE parquet file or a DIRECTORY
    of part files (the scale artifacts write directories)."""
    return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"


def main(sf_dir, oracle_path, out_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {rd(f'{sf_dir}/{t}.parquet')}")
    oracles = json.load(open(oracle_path))
    # warmup pass (OS page cache, duckdb readers) mirrors Bench's warmup
    for name, sql in sorted(oracles.items()):
        try:
            con.sql(sql).fetchall()
        except Exception:
            pass
    times, errors = {}, {}
    for name, sql in sorted(oracles.items()):
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
            times[name] = time.perf_counter() - t0
        except Exception as e:
            errors[name] = str(e).split("\n")[0]
    doc = {
        "metric": "duckdb_total",
        "value": sum(times.values()),
        "unit": "sec",
        "queries": times,
        "errors": errors,
        "sf": sf_dir,
        "note": ("single-node DuckDB wall-times for the oracle SQL battery "
                 "at the same scale factor; compare query-for-query with "
                 "BENCH queries of the same name"),
    }
    out = json.dumps(doc)
    if out_path:
        open(out_path, "w").write(out + "\n")
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

#!/usr/bin/env python3
"""Build a 10x scale copy of sf0.1 for the sf1 scaling proof.

Deterministic: each fact table is replicated 10 times with key columns
offset by i * (max_key + 1) so join cardinalities scale linearly and
keys stay unique. Dimension tables (region, nation) are copied as-is.
Output goes to /tmp/graft_sf1 (NOT /root/testdata, which is read-only).

This is a load-scaling artifact only — correctness oracles keep using
the driver-generated sf dirs.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10

# key columns to offset per table (so joins scale, not fan out)
OFFSET_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def columns(table):
    return [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]

for table in COPY_AS_IS:
    con.sql(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
            f"'{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied")

for table, keys in OFFSET_KEYS.items():
    src = f"'{SRC}/{table}.parquet'"
    cols = columns(table)
    present = [k for k in keys if k in cols]
    missing = [k for k in keys if k not in cols]
    if missing:
        print(f"{table}: skipping absent keys {missing}")
    ranges = {k: con.sql(f"SELECT max({k}) FROM {src}").fetchone()[0] + 1
              for k in present}
    selects = []
    for i in range(COPIES):
        exprs = []
        for c in cols:
            if c in present and i > 0:
                exprs.append(f"{c} + {i * ranges[c]} AS {c}")
            else:
                exprs.append(c)
        selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
    union = " UNION ALL ".join(selects)
    con.sql(f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

print("done:", DST)

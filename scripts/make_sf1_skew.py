#!/usr/bin/env python3
"""Build a skewed variant of the sf1 dataset for the skew-resilience proof.

Takes the uniform 10x dataset (scripts/make_sf1.py output) and injects the
three skews a real 100 TB corpus exhibits, deterministically (modulo
arithmetic on keys, no RNG):

- hot customer: 30% of orders point at one customer key (join skew — the
  shuffle partition holding that key sees ~0.3 * |orders| rows)
- hot date: 30% of orders collapse onto one order date (agg/window skew)
- boilerplate documents: 40% of documents share one boilerplate text
  (dedup/LSH skew — every banding scheme hashes them into the same
  buckets, exactly what maxBucketSize caps exist for)
- hot embedding: 20% of embeddings become one constant vector (cosine
  near-dup bucket skew)

Foreign keys are remapped INTO existing dimension keys, so fk/pk
alignment (asserted by make_sf1.py) is preserved by construction.
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1_skew"

HOT_CUST = 1          # must exist in customer
HOT_DATE = "DATE '1995-06-15'"
BOILER = ("This document is provided for informational purposes only and "
          "is subject to change without notice. " * 12)  # ~1.2 KB, shingle-rich

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def rd(path):
    """sf1 tables are DIRECTORIES of part files (one per replica copy)."""
    return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"


def wr(query, table):
    """Write a transformed table keeping the many-file layout: the skew
    transforms are row-wise, so per-thread output preserves the scan
    parallelism the uniform artifact has."""
    out = f"{DST}/{table}.parquet"
    if os.path.isfile(out):
        os.remove(out)
    if os.path.isdir(out):
        shutil.rmtree(out)
    con.sql(f"COPY ({query}) TO '{out}' "
            "(FORMAT PARQUET, PER_THREAD_OUTPUT TRUE)")


PASSTHROUGH = ["region", "nation", "customer", "supplier", "part", "events"]
for t in PASSTHROUGH:
    wr(f"SELECT * FROM {rd(f'{SRC}/{t}.parquet')}", t)
    print(f"{t}: copied")

# orders: hot customer + hot date on the same deterministic 30% slice
cols = [r[0] for r in con.sql(
    f"DESCRIBE SELECT * FROM {rd(f'{SRC}/orders.parquet')}").fetchall()]
exprs = []
for c in cols:
    if c == "o_custkey":
        exprs.append(f"CASE WHEN o_orderkey % 10 < 3 THEN {HOT_CUST} "
                     f"ELSE o_custkey END AS o_custkey")
    elif c == "o_orderdate":
        exprs.append(f"CASE WHEN o_orderkey % 10 < 3 THEN {HOT_DATE} "
                     f"ELSE o_orderdate END AS o_orderdate")
    else:
        exprs.append(c)
wr(f"SELECT {', '.join(exprs)} FROM {rd(f'{SRC}/orders.parquet')}", "orders")
share = con.sql(f"SELECT count(*) FILTER (o_custkey = {HOT_CUST}) * 1.0 / count(*) "
                f"FROM {rd(f'{DST}/orders.parquet')}").fetchone()[0]
print(f"orders: hot-customer share {share:.2f}")

# lineitem: inherits order skew through l_orderkey (30% of orders are hot);
# also make one part hot so the part-side join skews too
cols = [r[0] for r in con.sql(
    f"DESCRIBE SELECT * FROM {rd(f'{SRC}/lineitem.parquet')}").fetchall()]
exprs = [("CASE WHEN l_orderkey % 10 < 3 THEN 1 ELSE l_partkey END AS l_partkey"
          if c == "l_partkey" else c) for c in cols]
wr(f"SELECT {', '.join(exprs)} FROM {rd(f'{SRC}/lineitem.parquet')}", "lineitem")
print("lineitem: hot-part injected")

# documents: 40% boilerplate duplicates
boiler_sql = BOILER.replace("'", "''")
wr(f"SELECT * REPLACE (CASE WHEN doc_id % 5 < 2 THEN '{boiler_sql}' "
   f"ELSE text END AS text) FROM {rd(f'{SRC}/documents.parquet')}", "documents")
print("documents: 40% boilerplate")

# embeddings: 20% collapse onto one constant vector
dim = con.sql(f"SELECT len(embedding) FROM {rd(f'{SRC}/embeddings.parquet')} LIMIT 1"
              ).fetchone()[0]
const_vec = "[" + ", ".join(["0.1"] * dim) + "]::FLOAT[]"
wr(f"SELECT * REPLACE (CASE WHEN vec_id % 5 = 0 THEN {const_vec} "
   f"ELSE embedding END AS embedding) FROM {rd(f'{SRC}/embeddings.parquet')}", "embeddings")
print("embeddings: 20% constant vector")

# integrity: the remaps must not create dangling fks
for fact, fk, dim_t, pk in [("orders", "o_custkey", "customer", "c_custkey"),
                            ("lineitem", "l_partkey", "part", "p_partkey")]:
    dangling = con.sql(
        f"SELECT count(*) FROM {rd(f'{DST}/{fact}.parquet')} f "
        f"LEFT JOIN {rd(f'{DST}/{dim_t}.parquet')} d ON f.{fk} = d.{pk} "
        f"WHERE d.{pk} IS NULL").fetchone()[0]
    assert dangling == 0, f"{fact}.{fk}: {dangling} dangling rows"
print("fk alignment holds under skew")
print("done:", DST)

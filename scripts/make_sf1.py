#!/usr/bin/env python3
"""Build a 10x scale copy of sf0.1 for the sf1 scaling proof.

Deterministic: each table is replicated 10 times with key columns offset
by i * domain_size so join cardinalities scale linearly and keys stay
unique. Crucially, a foreign key's offset domain comes from the OWNING
dimension's primary-key range (o_custkey steps by customer's c_custkey
domain, not by its own max): with realistic key distributions where not
every dimension row is referenced, per-column offsets would shift fk
replicas out of alignment with their pk replicas and silently skew every
join in the scale proof. An up-front max(fk) <= max(pk) assertion guards
the same invariant on the source data. Dimension-less entity keys
(user_id, doc_id, ...) own their domain. Dimension tables (region,
nation) are copied as-is. Output goes to /tmp/graft_sf1 (NOT
/root/testdata, which is read-only).

This is a load-scaling artifact only — correctness oracles keep using
the driver-generated sf dirs.
"""
import os
import shutil
import sys

import duckdb

# make_sf1.py [DST] [SRC] [tables]
#   DST     output dir (default /tmp/graft_sf1)
#   SRC     input dir (default sf0.1; pass /tmp/graft_sf1 to build sf10 —
#           replication composes because offsets stride by the SOURCE's
#           own pk domain)
#   tables  comma list restricting the build (e.g. "documents,embeddings"
#           for the index-family sf10 spot check); alignment spot checks
#           only run for tables actually built
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
COPIES = 10

# key domain registry: domain name -> (owning table, pk column). Every
# offset key below draws its stride from one of these domains.
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),  # standalone entity, no dim table
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

# key columns to offset per table: column -> domain (so joins scale, not
# fan out, and fk replicas land exactly on their pk replicas)
OFFSET_KEYS = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ["region", "nation"]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def rd(path):
    """Read spec for a table that may be ONE parquet file (driver
    testdata) or a DIRECTORY of part files (a scale artifact composed
    from a previous run — sf10 from sf1)."""
    return f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"


def columns(table):
    return [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM {rd(f'{SRC}/{table}.parquet')}").fetchall()]

# domain sizes from the OWNING table's pk range
domain_size = {}
for dom, (owner, pk) in DOMAINS.items():
    domain_size[dom] = con.sql(
        f"SELECT max({pk}) FROM {rd(f'{SRC}/{owner}.parquet')}").fetchone()[0] + 1

# integrity gate: every fk must fit inside its owning domain BEFORE
# replication, else the replicas would join against shifted keys
violations = []
for table, keymap in OFFSET_KEYS.items():
    cols = columns(table)
    for col, dom in keymap.items():
        if col not in cols:
            continue
        owner, pk = DOMAINS[dom]
        if (table, col) == (owner, pk):
            continue
        fk_max = con.sql(
            f"SELECT max({col}) FROM {rd(f'{SRC}/{table}.parquet')}").fetchone()[0]
        if fk_max + 1 > domain_size[dom]:
            violations.append(
                f"{table}.{col} max {fk_max} exceeds {owner}.{pk} domain "
                f"{domain_size[dom] - 1}")
if violations:
    sys.exit("fk/pk domain violations:\n  " + "\n  ".join(violations))

for table in COPY_AS_IS:
    if ONLY is not None and table not in ONLY:
        continue
    con.sql(f"COPY (SELECT * FROM {rd(f'{SRC}/{table}.parquet')}) TO "
            f"'{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied")

for table, keymap in OFFSET_KEYS.items():
    if ONLY is not None and table not in ONLY:
        continue
    src = rd(f"{SRC}/{table}.parquet")
    cols = columns(table)
    present = {k: d for k, d in keymap.items() if k in cols}
    missing = [k for k in keymap if k not in cols]
    if missing:
        print(f"{table}: skipping absent keys {missing}")
    selects = []
    for i in range(COPIES):
        exprs = []
        for c in cols:
            if c in present and i > 0:
                exprs.append(f"{c} + {i * domain_size[present[c]]} AS {c}")
            else:
                exprs.append(c)
        selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
    # one file per replica copy under a table DIRECTORY: a real corpus
    # at this scale is many files (one per ingest batch), and Spark's
    # scan parallelism follows the file layout — a single small-byte
    # file would serialize every CPU-dense projection into one task
    out = f"{DST}/{table}.parquet"
    if os.path.isfile(out):
        os.remove(out)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for i, sel in enumerate(selects):
        con.sql(f"COPY ({sel}) TO '{out}/part-{i:02d}.parquet' "
                "(FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# post-build spot check: fk/pk alignment must hold on the replicas too
for fact, fk, dim, pk in [("orders", "o_custkey", "customer", "c_custkey"),
                          ("lineitem", "l_orderkey", "orders", "o_orderkey")]:
    if ONLY is not None and (fact not in ONLY or dim not in ONLY):
        continue
    dangling = con.sql(
        f"SELECT count(*) FROM {rd(f'{DST}/{fact}.parquet')} f "
        f"LEFT JOIN {rd(f'{DST}/{dim}.parquet')} d ON f.{fk} = d.{pk} "
        f"WHERE d.{pk} IS NULL").fetchone()[0]
    assert dangling == 0, f"{fact}.{fk}: {dangling} dangling fk rows"
    print(f"{fact}.{fk} -> {dim}.{pk}: aligned")

print("done:", DST)

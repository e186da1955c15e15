#!/usr/bin/env python3
"""Build (or verify) the FROZEN-content bench corpus.

Round-over-round bench deltas have twice been invalidated by driver
testdata regeneration (round 9: schema; round 14: content). This corpus
is the fix: a small (~sf0.05) slice COMMITTED INTO THE REPO under
`frozen/`, so its bytes are version-controlled and identical in every
round. BENCH_frozen_r{N}.json is produced against it each round and is
the ONLY artifact pair from which round-over-round per-query conclusions
are drawn.

Rules:
  - `frozen/` is regenerated ONLY on an explicit FROZEN_VERSION bump
    (which must be called out in SCALING.md); otherwise this script runs
    in --check mode and FAILS LOUDLY when the committed content drifts
    from frozen/frozen.sha256.
  - The slice keeps referential integrity: dims whole; orders halved on
    o_orderkey parity; lineitem restricted to kept orders; events halved
    on id parity; documents/embeddings whole (they drive the pair-family
    queries, whose cost profile is the one most worth tracking).

Usage:
    python3 scripts/make_frozen.py --check      # verify committed corpus
    python3 scripts/make_frozen.py --generate   # (version bump only)
"""
import hashlib
import os
import sys

FROZEN_VERSION = 1
SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, "frozen")
SUMFILE = os.path.join(DST, "frozen.sha256")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def content_checksum():
    """One sha256 over every table's CONTENT (canonical row hashes via
    DuckDB, ordered), not file bytes — parquet bytes can differ across
    writer versions for identical content, and content identity is what
    round-over-round comparability needs."""
    import duckdb
    con = duckdb.connect()
    h = hashlib.sha256()
    h.update(f"frozen_version={FROZEN_VERSION}\n".encode())
    for t in TABLES:
        (digest,) = con.sql(
            f"SELECT md5(string_agg(rh, ',' ORDER BY rh)) FROM ("
            f"  SELECT md5(CAST(r AS VARCHAR)) AS rh"
            f"  FROM '{DST}/{t}.parquet' r)").fetchone()
        h.update(f"{t}={digest}\n".encode())
    return h.hexdigest()


def generate():
    import duckdb
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    copy_whole = ["region", "nation", "customer", "supplier", "part",
                  "documents", "embeddings"]
    for t in copy_whole:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet' ORDER BY 1) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    con.sql(f"COPY (SELECT * FROM '{SRC}/orders.parquet' "
            f"WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey) "
            f"TO '{DST}/orders.parquet' (FORMAT PARQUET)")
    con.sql(f"COPY (SELECT l.* FROM '{SRC}/lineitem.parquet' l "
            f"WHERE l.l_orderkey % 2 = 0 "
            f"ORDER BY l.l_orderkey, l.l_linenumber) "
            f"TO '{DST}/lineitem.parquet' (FORMAT PARQUET)")
    con.sql(f"COPY (SELECT * FROM '{SRC}/events.parquet' "
            f"WHERE event_id % 2 = 0 ORDER BY event_id) "
            f"TO '{DST}/events.parquet' (FORMAT PARQUET)")
    with open(SUMFILE, "w") as f:
        f.write(f"{content_checksum()}  frozen_version={FROZEN_VERSION}\n")
    print(f"generated frozen corpus v{FROZEN_VERSION} -> {DST}")
    for t in TABLES:
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows")


def check():
    if not os.path.exists(SUMFILE):
        print("FROZEN CHECK FAILED: no frozen/frozen.sha256 — generate "
              "the corpus once with --generate and commit it",
              file=sys.stderr)
        return 1
    want = open(SUMFILE).read().split()[0]
    got = content_checksum()
    if want != got:
        print(f"FROZEN CHECK FAILED: content drift (want {want[:16]}…, "
              f"got {got[:16]}…). The frozen corpus may only change on an "
              f"explicit FROZEN_VERSION bump.", file=sys.stderr)
        return 1
    print(f"frozen corpus OK (v{FROZEN_VERSION}, {got[:16]}…)")
    return 0


if __name__ == "__main__":
    if "--generate" in sys.argv:
        generate()
        sys.exit(check())
    sys.exit(check())

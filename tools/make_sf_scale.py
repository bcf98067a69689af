#!/usr/bin/env python
"""Scale the sf0.1 test tables 10× to a local sf1 set for amortization
measurement (VERDICT r2 item #4: the ~0.3-1 s/query JVM floor claim has
never been checked at sf1).

Replicates each fact table 10× with a key offset per replica so key
cardinalities, join fan-outs, and group counts scale with the data
(plain duplication would keep group counts flat and overweight the
aggregation stages). Dimension tables (region, nation) stay as-is, like
TPC-H's fixed dims. Customer/supplier/part/orders/lineitem/events all
shift their synthetic BIGINT keys by ``replica * OFFSET``; cross-table
references (l_orderkey→o_orderkey, o_custkey→c_custkey, …) shift by the
same constant, so referential joins behave exactly as at sf0.1 — just
10× wider.

Output: ``<out>/<table>.parquet/`` DIRECTORIES of one file per replica
(Spark reads the directory natively; 10 files ⇒ ≥10 input splits, so
the scan parallelizes without tuning maxPartitionBytes).

Usage: python tools/make_sf_scale.py [src_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 100_000_000  # far above any sf0.1 key

# per-table: columns that are entity keys to shift by replica*OFFSET
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    for t in DIMS:
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{d}/part-0.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied dim")
    for t, keys in KEY_COLS.items():
        cols = [
            (r[0], r[1])
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        for i in range(factor):
            # TIMESTAMP would round-trip as parquet TIMESTAMP_NTZ, which
            # Spark refuses in instant-typed expressions (unix_micros);
            # TIMESTAMPTZ writes instant semantics (machine TZ is UTC,
            # values unchanged)
            sel = ", ".join(
                f"{c} + {i * OFFSET} AS {c}"
                if c in keys
                else (f"CAST({c} AS TIMESTAMPTZ) AS {c}" if ty == "TIMESTAMP" else c)
                for c, ty in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"{t}: {n} rows in {factor} files")

    # LLM tables: keys shift like the facts; content is perturbed per
    # replica (a replica token appended to text, a tiny per-replica
    # epsilon on embeddings) so dedup/similarity structure scales
    # instead of becoming 10x exact duplicates of the originals.
    d = os.path.join(out, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    for i in range(factor):
        con.execute(
            f"""COPY (
              SELECT doc_id + {i * OFFSET} AS doc_id,
                     text || ' r{i}' AS text,
                     lang, source,
                     CAST(length(text || ' r{i}') AS BIGINT) AS n_chars
              FROM read_parquet('{src}/documents.parquet')
            ) TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"""
        )
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    print(f"documents: {n} rows in {factor} files")
    d = os.path.join(out, "embeddings.parquet")
    os.makedirs(d, exist_ok=True)
    for i in range(factor):
        con.execute(
            f"""COPY (
              SELECT vec_id + {i * OFFSET} AS vec_id,
                     list_transform(embedding,
                       x -> CAST(x + {i} * 0.000001 AS FLOAT)) AS embedding,
                     label
              FROM read_parquet('{src}/embeddings.parquet')
            ) TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"""
        )
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    print(f"embeddings: {n} rows in {factor} files")


if __name__ == "__main__":
    main()

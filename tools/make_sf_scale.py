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
        if i == 0:
            # replica 0 is the PRISTINE base corpus on both LLM tables
            # (embeddings' epsilon is i*1e-6 = 0 at i=0; perturbing the
            # text here too would make the two tables inconsistent —
            # scaled corpus would contain the original vectors but not
            # the original texts)
            con.execute(
                f"""COPY (SELECT * FROM read_parquet('{src}/documents.parquet'))
                TO '{d}/part-0.parquet' (FORMAT PARQUET)"""
            )
            continue
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

    if os.environ.get("SPARK_GRAFT_NO_ZIPF"):
        # targeted regens (scale-trend runs) skip the factor²-row skew
        # sidecar — only tools/bench_skew.py reads it
        print("events_zipf: skipped (SPARK_GRAFT_NO_ZIPF)")
        return

    # Skew sidecar: the scaled events with a PATHOLOGICAL user_id
    # distribution — one hot key holding 50% of all rows, the rest
    # uniform over 100k cold keys (the power-law shape operators/skew.py
    # exists for). Deterministic: the hot/cold draw and the cold key both
    # come from md5(event_id), so regeneration is bit-stable. Used by
    # tools/bench_skew.py to MEASURE salted vs unsalted at sf1.
    # 10× the sf1 row count (factor² replicas of the sf0.1 events): at
    # 1M rows every strategy finishes sub-second on local[32] and the
    # measurement is noise; the hot reducer needs real volume to hurt.
    d = os.path.join(out, "events_zipf.parquet")
    os.makedirs(d, exist_ok=True)
    eid = f"event_id + {OFFSET} * ri.i"
    u1 = f"(strpos('0123456789abcdef', substr(md5(CAST({eid} AS VARCHAR)), 1, 1)) - 1) / 16.0"
    u2 = (
        f"((strpos('0123456789abcdef', substr(md5(CAST({eid} AS VARCHAR)), 3, 1)) - 1) * 16 * 16 * 16"
        f" + (strpos('0123456789abcdef', substr(md5(CAST({eid} AS VARCHAR)), 4, 1)) - 1) * 16 * 16"
        f" + (strpos('0123456789abcdef', substr(md5(CAST({eid} AS VARCHAR)), 5, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(md5(CAST({eid} AS VARCHAR)), 6, 1)) - 1)) / 65536.0"
    )
    for i in range(factor):
        con.execute(
            f"""COPY (
              SELECT {eid} AS event_id,
                     CAST(ts AS TIMESTAMPTZ) AS ts,
                     CASE WHEN {u1} < 0.5 THEN CAST(0 AS BIGINT)
                          ELSE CAST(1 + floor({u2} * 99999) AS BIGINT) END AS user_id,
                     event_type, value, props
              FROM read_parquet('{src}/events.parquet'),
                   UNNEST(generate_series({i * factor}, {i * factor + factor - 1})) ri(i)
            ) TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"""
        )
    stats = con.sql(
        f"SELECT COUNT(*), COUNT(*) FILTER (user_id = 0) * 1.0 / COUNT(*) "
        f"FROM read_parquet('{d}/*.parquet')"
    ).fetchone()
    print(f"events_zipf: {stats[0]} rows, hot-key share {stats[1]:.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bounded-storage receipt for the unified vacuum layer (r11).

The r10 verdict asked for one retention API over the four CDC-
maintained structures AND a receipt that storage stays bounded under a
fold history. This tool drives N successive CDC folds against the BM25
index, the dedup index, and a bucketed state store, recording after
every fold: on-disk directory count, total bytes, and what `vacuum()`
reclaims — then asserts the post-vacuum live set does NOT grow with
fold count (beyond the structure's own data growth) and that every
structure stays readable after each sweep.

Usage: python tools/bench_vacuum.py [sf_dir] [--folds 8]
Prints ONE JSON line → BENCH_VACUUM.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dirs_and_bytes(path: str) -> tuple[int, int]:
    n_dirs, total = 0, 0
    for root, dirs, files in os.walk(path):
        n_dirs += len(dirs)
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return n_dirs, total


def main() -> None:
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.maintenance import vacuum
    from python_cdc_spark.operators.bm25_index import (
        bm25_search,
        build_bm25_index,
        cdc_bm25_update,
    )
    from python_cdc_spark.operators.incremental_dedup import (
        build_dedup_index,
        cdc_dedup_index_update,
        read_components,
    )
    from python_cdc_spark.session import get_spark
    from python_cdc_spark.streaming.state_store import BucketedStateStore

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    folds = 8
    for a in sys.argv[1:]:
        if a.startswith("--folds"):
            folds = int(a.split("=", 1)[1]) if "=" in a else int(
                sys.argv[sys.argv.index(a) + 1]
            )

    spark = get_spark()
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = int(docs.agg(F.max("doc_id")).first()[0])
    base = docs.filter(F.col("doc_id") % 7 != 0)

    out: dict = {"metric": "vacuum_bounded_storage", "sf_dir": sf_dir, "folds": folds}
    with tempfile.TemporaryDirectory() as tmp:
        bm25 = os.path.join(tmp, "bm25")
        dd = os.path.join(tmp, "dedup")
        st = os.path.join(tmp, "store")
        build_bm25_index(spark, base, bm25)
        build_dedup_index(spark, base, dd)
        store = BucketedStateStore(spark, st)

        series = {"bm25": [], "dedup": [], "state_store": []}
        t0 = time.time()
        for i in range(folds):
            # rotating I/U/D delta: each fold re-images one residue slice
            # and inserts a fresh id block
            upd = docs.filter(F.col("doc_id") % 7 == 0).filter(
                F.col("doc_id") % folds == i
            )
            delta = upd.select(
                F.lit("INSERT").alias("operation"),
                (F.col("doc_id") + (i + 1) * (max_id + 10)).alias("doc_id"),
                "text",
            ).unionByName(
                upd.limit(50).select(
                    F.lit("UPDATE").alias("operation"),
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" fold{i}")).alias("text"),
                )
            )
            cdc_bm25_update(spark, bm25, delta, batch_tag=f"fold{i:04d}")
            cdc_dedup_index_update(spark, dd, delta, batch_tag=f"fold{i:04d}")
            state = upd.select(
                F.col("doc_id").alias("key"),
                F.lit(i).alias("val"),
                (F.col("doc_id") % 8).alias("bucket"),
            )
            store.commit(state, list(range(8)))

            for name, path in (("bm25", bm25), ("dedup", dd), ("state_store", st)):
                rep = vacuum(spark, path, retain_last=1)
                n_dirs, n_bytes = _dirs_and_bytes(path)
                series[name].append(
                    {
                        "fold": i,
                        "dirs_after_vacuum": n_dirs,
                        "bytes_after_vacuum": n_bytes,
                        "removed": len(rep["removed"]),
                        "reclaimed_bytes": rep["reclaimed_bytes"],
                    }
                )
        out["wall_sec"] = round(time.time() - t0, 2)

        # dedup delta dirs grow linearly by design until compaction —
        # compact, vacuum, and show the count re-bounds
        from python_cdc_spark.operators.incremental_dedup import compact_dedup_index

        comp_before = sorted(map(tuple, read_components(spark, dd).collect()))
        absorbed = compact_dedup_index(spark, dd)
        rep = vacuum(spark, dd, retain_last=1)
        n_dirs, n_bytes = _dirs_and_bytes(dd)
        out["dedup_compaction"] = {
            "absorbed_deltas": absorbed,
            "dirs_after": n_dirs,
            "bytes_after": n_bytes,
            "vacuum_removed": len(rep["removed"]),
        }
        assert sorted(map(tuple, read_components(spark, dd).collect())) == comp_before
        assert n_dirs <= series["dedup"][0]["dirs_after_vacuum"] + 2

        # readability after the final sweep
        assert bm25_search(spark, bm25, ("the", "a"), 5).count() >= 0
        assert store.read() is not None

        # boundedness: dir count at the last fold must not exceed the
        # first-fold count by more than the structures' genuine growth
        # (inserted corpus slices). Pin: state store ≤ retention window;
        # dedup delta dirs ≤ folds-not-yet-compacted (linear by design
        # until compaction) — so the HARD gate is bm25 + state_store.
        bm_first, bm_last = series["bm25"][0], series["bm25"][-1]
        out["bm25_dirs_first_last"] = [bm_first["dirs_after_vacuum"], bm_last["dirs_after_vacuum"]]
        ss_dirs = [p["dirs_after_vacuum"] for p in series["state_store"]]
        out["state_store_dirs"] = ss_dirs
        assert max(ss_dirs) <= ss_dirs[0] + 2, "state store dirs must stay in the retention window"
        # bm25: bucket-version dirs are constant-count (one per live
        # bucket) + one meta dir; growth would mean vacuum missed dirs
        assert bm_last["dirs_after_vacuum"] <= bm_first["dirs_after_vacuum"] + 2

        out["series"] = series
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Delta-width sweep for the BM25 CDC fold — the O(touched) receipt.

The registered gate folds the shared fixture delta (~45% corpus churn,
touching all 64 buckets), so its bench row shows the WORST case. This
tool folds deltas of increasing width into the same sf1 base index and
records touched buckets + wall seconds per fold, against the
from-scratch rebuild time — the narrow-delta end is where a production
CDC feed lives, and fold cost there must track the DELTA, not the
corpus (operators/bm25_index.py's O(delta + touched buckets) claim).

Usage: python tools/bench_bm25_cdc.py [sf_dir]
Prints ONE JSON line → BENCH_BM25_CDC.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTHS = (8, 64, 512, 4096)


def main() -> None:
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.bm25_index import (
        bm25_search,
        build_bm25_index,
        cdc_bm25_update,
    )
    from python_cdc_spark.queries.helpers import cdc_corpus_split
    from python_cdc_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/repo/.sf1"
    )
    spark = get_spark()
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    base, gate_delta = cdc_corpus_split(docs)
    gate_delta = gate_delta.localCheckpoint(eager=True)

    out: dict = {"metric": "bm25_cdc_delta_width_sweep", "sf_dir": sf_dir,
                 "unit": "sec", "folds": []}
    with tempfile.TemporaryDirectory() as tmp:
        pristine = os.path.join(tmp, "pristine")
        t0 = time.time()
        n = build_bm25_index(spark, base, pristine)
        out["rebuild_sec"] = round(time.time() - t0, 2)
        out["base_docs"] = n

        # deterministic width slices of the gate delta (crc32 order)
        ranked = gate_delta.withColumn(
            "__r",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                    F.crc32(F.col("doc_id").cast("string")), F.col("doc_id")
                )
            ),
        ).localCheckpoint(eager=True)
        for w in WIDTHS:
            work = os.path.join(tmp, f"w{w}")
            shutil.copytree(pristine, work)
            delta = ranked.filter(F.col("__r") <= w).drop("__r")
            t0 = time.time()
            stats = cdc_bm25_update(spark, work, delta)
            fold_sec = time.time() - t0
            t0 = time.time()
            k = bm25_search(spark, work, ("join", "scan"), 10).count()
            out["folds"].append({
                "delta_rows": w,
                "touched_buckets": stats["touched_buckets"],
                "total_buckets": stats["total_buckets"],
                "fold_sec": round(fold_sec, 2),
                "fold_over_rebuild": round(fold_sec / out["rebuild_sec"], 3),
                "search_sec": round(time.time() - t0, 2),
                "search_rows": k,
            })
            shutil.rmtree(work, ignore_errors=True)

        # the gate's own wide delta (~45% churn) for the worst-case row
        work = os.path.join(tmp, "gate")
        shutil.copytree(pristine, work)
        t0 = time.time()
        stats = cdc_bm25_update(spark, work, gate_delta)
        fold_sec = time.time() - t0
        out["folds"].append({
            "delta_rows": gate_delta.count(),
            "touched_buckets": stats["touched_buckets"],
            "total_buckets": stats["total_buckets"],
            "fold_sec": round(fold_sec, 2),
            "fold_over_rebuild": round(fold_sec / out["rebuild_sec"], 3),
            "gate_fixture": True,
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()

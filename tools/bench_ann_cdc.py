#!/usr/bin/env python
"""Incremental-vs-refit receipt for the CDC-maintained ANN index
(VERDICT r9 item #2): time the O(touched-cells) maintenance fold
(operators/ann_index.maintain_ivf_lists_cdc) against the full rebuild
it replaces, on the same delta, and record how many cell directories
each one writes.

The gate query (ann_index_cdc_maintained) proves CORRECTNESS with a
30%-of-corpus delta and k=16 (every cell touched — the equality check
wants coverage). This receipt measures the ECONOMICS with the shape
maintenance exists for: a small delta (~0.5% of the corpus) against a
finer quantizer (k scales with corpus size), where the fold rewrites a
handful of cell directories while the rebuild re-places and rewrites
all of them. exact=False throughout — decimal routing exists only for
oracle hashing; this is a Spark-only perf receipt.

Usage: python tools/bench_ann_cdc.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 and ./.sf1 when present.
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = 64


def _fresh_spark():
    from pyspark.sql import SparkSession

    from python_cdc_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name="bench_ann_cdc")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def bench_one(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.ann_index import (
        build_ivf_lists,
        maintain_ivf_lists_cdc,
    )
    from python_cdc_spark.operators.similarity import kmeans_fit

    spark = _fresh_spark()
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    # quantizer granularity scales with the corpus (k ~ sqrt-ish): the
    # receipt wants enough cells that a small delta leaves most alone
    k = 64 if n <= 4_000 else 256
    m = F.col("vec_id") % 10
    base = e.filter(m != 0)
    # frozen quantizer: fit once on base (amortized index-build cost,
    # not part of either timed side)
    cent = kmeans_fit(base, "vec_id", "embedding", k=k, iters=2,
                      exact=False, dims=DIMS).localCheckpoint(eager=True)
    payload = {"head_val": F.col("embedding")[0].cast("double")}

    # ~0.5% surgical delta: a few inserts from the held-out stripe, a
    # few updates (re-imaged vectors), a few deletes
    sel = F.col("vec_id") % 199
    delta = (
        e.filter((m == 0) & (sel == 0))
        .select(F.lit("I").alias("op"), "vec_id", "embedding")
        .unionByName(
            e.filter((m == 7) & (sel == 1)).select(
                F.lit("U").alias("op"), "vec_id",
                F.reverse("embedding").alias("embedding"))
        )
        .unionByName(
            e.filter((m == 3) & (sel == 2)).select(
                F.lit("D").alias("op"), "vec_id", "embedding")
        )
    ).localCheckpoint(eager=True)
    n_delta = delta.count()

    work = tempfile.mkdtemp(prefix="ann_cdc_bench_")
    try:
        idx_dir = os.path.join(work, "idx")
        t0 = time.perf_counter()
        build_ivf_lists(spark, idx_dir, base, cent, payload=payload,
                        fingerprint="bench", params={}, exact=False, dims=DIMS)
        build_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        stats = maintain_ivf_lists_cdc(spark, idx_dir, delta, payload=payload,
                                       exact=False, dims=DIMS)
        fold_sec = time.perf_counter() - t0

        # the comparator: full refresh on the post-apply corpus with the
        # same frozen quantizer — re-place every vector, rewrite every
        # cell directory (what a system without incremental maintenance
        # must do per delta)
        final = (
            e.filter(m != 3)
            .withColumn(
                "embedding",
                F.when(m == 7, F.reverse("embedding")).otherwise(F.col("embedding")),
            )
        )
        rebuild_dir = os.path.join(work, "rebuild")
        t0 = time.perf_counter()
        build_ivf_lists(spark, rebuild_dir, final, cent, payload=payload,
                        fingerprint="bench", params={}, exact=False, dims=DIMS)
        rebuild_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)

    return {
        "n_vectors": n,
        "k_cells": k,
        "n_delta_ops": n_delta,
        "build_sec": round(build_sec, 3),
        "fold_sec": round(fold_sec, 3),
        "rebuild_sec": round(rebuild_sec, 3),
        "fold_speedup_vs_rebuild": round(rebuild_sec / fold_sec, 2),
        "touched_cells": stats["touched_cells"],
        "total_cells": stats["total_cells"],
        "cells_rewritten_frac": round(
            stats["touched_cells"] / stats["total_cells"], 3
        ),
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = sys.argv[1:] or [
        d for d in ["/root/testdata/sf0.1", os.path.join(repo, ".sf1")]
        if os.path.isdir(d)
    ]
    out = {"metric": "ann_cdc_fold_vs_rebuild", "unit": "sec", "per_scale": {}}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        out["per_scale"][label] = bench_one(d)
        print(f"# {label}: {out['per_scale'][label]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Constant-duplicate-density scale receipt for the dedup folds
(r12 verdict #2 — the one scale claim previously defended by prose).

The ``.sfN`` replica generator appends a per-replica suffix to every
document, so TRUE duplicate pairs grow ~factor² with scale — the
super-linear sf1→sf10 exponents in SCALE_TREND_r12 (1.12/1.44 per
decade) measure that workload, not the plan. This tool holds duplicate
density CONSTANT: a synthetic corpus of N docs where a fixed FRACTION
of docs belongs to fixed-SIZE near-dup clusters (members share a
40-token base text and differ by one suffix token → Jaccard ≈ 0.86,
above the 0.5 verify threshold), and every other doc is unique
(id-hashed tokens, vocab 30k — accidental near-dups are negligible).
True duplicate pairs therefore grow LINEARLY with N; per-doc density is
constant across the 100× range.

Measured per scale (5k / 50k / 500k docs — the BM25 receipt's shape,
BENCH_BM25_SCALE.json):

- base index build (context, expected ~linear),
- ``incremental_dedup_update``: a CONSTANT 10-doc insert-only fold,
- ``cdc_dedup_index_update``: a CONSTANT 15-row I/U/D delta touching
  three clusters and a handful of uniques — the affected-component
  incremental path (15/N is far under the 0.35 reroute crossover).

The claim under test: with duplicate DENSITY constant, both folds are
O(delta + affected members) — affected membership is bounded by the
fixed cluster size — so fold cost must stay ~flat (exponent well under
0.5/decade) while the corpus grows 100×.

Usage: python tools/bench_dedup_scale.py [--scales=5000,50000,500000]
Prints ONE JSON line; commit as BENCH_DEDUP_SCALE.json.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLUSTER_SIZE = 3
CLUSTER_RATE = 0.06  # fraction of docs living in near-dup clusters
TOKENS = 40
VOCAB = 30_000


def constant_density_corpus(spark, n_docs: int):
    """N docs: the first ``rate*N`` (rounded to whole clusters) form
    3-member near-dup clusters (shared 40-token base + one member
    token); the rest are unique. Pure Catalyst expressions — no Python
    row generation at any scale."""
    from pyspark.sql import functions as F

    n_cluster_docs = int(n_docs * CLUSTER_RATE) // CLUSTER_SIZE * CLUSTER_SIZE
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    base = (
        F.when(
            F.col("doc_id") < n_cluster_docs,
            (F.col("doc_id") / CLUSTER_SIZE).cast("long"),
        )
        .otherwise(F.col("doc_id") + F.lit(10_000_000))
    )
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(TOKENS)),
        lambda p: F.concat(F.lit("w"), F.pmod(F.xxhash64(base, p), F.lit(VOCAB))),
    )
    member = F.when(
        F.col("doc_id") < n_cluster_docs,
        F.concat(F.lit(" m"), F.pmod(F.col("doc_id"), F.lit(CLUSTER_SIZE))),
    ).otherwise(F.lit(""))
    return df.select(
        "doc_id", F.concat(F.array_join(toks, " "), member).alias("text")
    )


def constant_deltas(spark, corpus_path: str, n_docs: int):
    """(insert_docs, cdc_delta): constant width at every scale. The CDC
    delta splits cluster 0 (update a member to unique text), shrinks
    cluster 1 (delete a member), grows cluster 2 (insert a new member
    cloning an existing member's text + suffix), and touches 9 uniques
    (3 UPDATE / 3 DELETE / 3 INSERT)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(corpus_path)
    uniq0 = int(n_docs * CLUSTER_RATE) // CLUSTER_SIZE * CLUSTER_SIZE
    ins = docs.filter(F.col("doc_id").between(uniq0, uniq0 + 9)).select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" ins")).alias("text"),
    )
    upd_ids = [0, uniq0 + 20, uniq0 + 21, uniq0 + 22]  # cluster-0 member + 3 uniques
    del_ids = [3, uniq0 + 30, uniq0 + 31, uniq0 + 32]  # cluster-1 member + 3 uniques
    cdc = (
        docs.filter(F.col("doc_id").isin(upd_ids))
        .select(
            F.lit("UPDATE").alias("operation"),
            "doc_id",
            # a long unique suffix drops Jaccard vs the old cluster
            F.concat(
                F.col("text"), F.lit(" zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10")
            ).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id").isin(del_ids)).select(
                F.lit("DELETE").alias("operation"),
                "doc_id",
                F.lit(None).cast("string").alias("text"),
            )
        )
        .unionByName(
            # new member joining cluster 2 (clone member doc 6 + suffix)
            docs.filter(F.col("doc_id") == 6).select(
                F.lit("INSERT").alias("operation"),
                F.lit(2 * n_docs).cast("long").alias("doc_id"),
                F.concat(F.col("text"), F.lit(" m9")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id").between(uniq0 + 40, uniq0 + 45)).filter(
                F.col("doc_id") % 2 == 0
            ).select(
                F.lit("INSERT").alias("operation"),
                (F.col("doc_id") + 3 * n_docs).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" nu")).alias("text"),
            )
        )
    )
    return ins, cdc


def main() -> None:
    from python_cdc_spark.operators.incremental_dedup import (
        build_dedup_index,
        cdc_dedup_index_update,
        incremental_dedup_update,
        read_components,
    )
    from python_cdc_spark.session import get_spark

    scales = [5_000, 50_000, 500_000]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark(app_name="bench_dedup_scale")
    spark.sparkContext.setLogLevel("ERROR")

    out = {
        "metric": "dedup_fold_constant_density_scale",
        "unit": "sec",
        "cluster_size": CLUSTER_SIZE,
        "cluster_rate": CLUSTER_RATE,
        "per_scale": [],
    }
    work = tempfile.mkdtemp(prefix="dedup_scale_")
    try:
        for n in scales:
            row = {"corpus_docs": n}
            corpus_path = os.path.join(work, f"corpus_{n}")
            constant_density_corpus(spark, n).repartition(32).write.mode(
                "overwrite"
            ).parquet(corpus_path)
            docs = spark.read.parquet(corpus_path)
            idx = os.path.join(work, f"idx_{n}")

            t0 = time.time()
            build_dedup_index(spark, docs, idx)
            row["build_sec"] = round(time.time() - t0, 2)
            row["clusters_base"] = (
                read_components(spark, idx).select("component").distinct().count()
            )

            ins, cdc = constant_deltas(spark, corpus_path, n)
            t0 = time.time()
            incremental_dedup_update(spark, idx, ins)
            row["insert_fold_sec"] = round(time.time() - t0, 2)

            t0 = time.time()
            stats = cdc_dedup_index_update(spark, idx, cdc)
            stats = stats.localCheckpoint(eager=True)
            row["cdc_fold_sec"] = round(time.time() - t0, 2)
            row["clusters_post"] = stats.select("component").distinct().count()
            out["per_scale"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
            shutil.rmtree(corpus_path, ignore_errors=True)
            shutil.rmtree(idx, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    if len(out["per_scale"]) >= 2:
        first, last = out["per_scale"][0], out["per_scale"][-1]
        decades = math.log10(last["corpus_docs"] / first["corpus_docs"])
        for k in ("insert_fold_sec", "cdc_fold_sec", "build_sec"):
            out[f"{k}_exp_per_decade"] = round(
                math.log10(max(last[k], 1e-9) / max(first[k], 1e-9)) / decades, 3
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

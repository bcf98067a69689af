#!/usr/bin/env python
"""Fold-vs-rebuild economics for the CDC-maintained dedup index (r10).

Builds the gram/band index over a base corpus (untimed), then measures
(a) ONE mixed I/U/D CDC fold (`cdc_dedup_index_update`) at a given
delta rate vs (b) a from-scratch rebuild over the post-CDC corpus —
the same comparison shape as BENCH_INCREMENTAL.json (insert-only fold)
and BENCH_ANN_CDC.json (IVF lists). Equality of the two component
tables is asserted BEFORE any number is reported.

The claim under test: fold cost tracks the DELTA + affected clusters;
rebuild cost tracks the CORPUS. The ratio must grow with corpus size
at a fixed delta rate.

Usage: python tools/bench_dedup_cdc.py [sf_dir ...] [--rate 0.05]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.incremental_dedup import (
        build_dedup_index,
        cdc_dedup_index_update,
        read_components,
    )
    from python_cdc_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rate = next(
        (float(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("--rate=")),
        0.05,
    )
    # --sweep: delta-WIDTH economics at one sf (r10 verdict #6 receipt):
    # sweep per-class rates from narrow to wide and show the fold never
    # loses to the rebuild by more than job-floor noise — narrow deltas
    # win on O(delta + affected), wide deltas reroute to the full
    # recompute past _AFFECTED_REBUILD_FRACTION and converge to ~1x.
    sweep = any(a.startswith("--sweep") for a in sys.argv[1:])
    sf_dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="bench_dedup_cdc")
    spark.sparkContext.setLogLevel("ERROR")

    if sweep:
        _sweep(spark, sf_dirs[0])
        return

    # delta-rate knobs, all modular on doc_id so they stay uniform over
    # the key-offset .sf1/.sf10 replicas: residue 0 updates, residue 1
    # deletes, residue 2 is held out of the base and inserted by the
    # delta — each class ~ rate of the corpus, delta ~ 3*rate total.
    out: dict = {"metric": "dedup_cdc_fold_vs_rebuild", "unit": "sec",
                 "delta_rate_per_class": rate, "per_sf": {}}
    mod = max(3, int(round(1.0 / rate)))
    for sf in sf_dirs:
        docs = table(spark, sf, "documents").select("doc_id", "text")
        is_base = F.col("doc_id") % mod != 2
        is_upd = F.col("doc_id") % mod == 0
        is_del = F.col("doc_id") % mod == 1
        delta = docs.filter((~is_base) | is_upd | is_del).select(
            F.when(~is_base, F.lit("INSERT"))
            .when(is_upd, F.lit("UPDATE"))
            .otherwise(F.lit("DELETE"))
            .alias("operation"),
            "doc_id",
            F.when(is_upd, F.concat(F.col("text"), F.lit(" upd")))
            .otherwise(F.col("text"))
            .alias("text"),
        ).localCheckpoint(eager=True)
        n_delta = delta.count()
        with tempfile.TemporaryDirectory() as tmp:
            idx = os.path.join(tmp, "idx")
            build_dedup_index(spark, docs.filter(is_base), idx)  # untimed
            t0 = time.perf_counter()
            folded = cdc_dedup_index_update(spark, idx, delta)
            folded.count()
            fold_sec = time.perf_counter() - t0

            post = docs.filter(~is_del).select(
                "doc_id",
                F.when(is_upd, F.concat(F.col("text"), F.lit(" upd")))
                .otherwise(F.col("text"))
                .alias("text"),
            )
            idx2 = os.path.join(tmp, "rebuild")
            t0 = time.perf_counter()
            build_dedup_index(spark, post, idx2)
            rebuilt = read_components(spark, idx2)
            rebuilt.count()
            rebuild_sec = time.perf_counter() - t0

            got = sorted(map(tuple, folded.select("v", "component").collect()))
            want = sorted(map(tuple, rebuilt.select("v", "component").collect()))
            assert got == want, f"fold != rebuild at {sf}"
            row = {
                "docs": docs.count(),
                "delta_events": n_delta,
                "fold_sec": round(fold_sec, 2),
                "rebuild_sec": round(rebuild_sec, 2),
                "speedup": round(rebuild_sec / fold_sec, 2),
                "clusters": len(set(c for _, c in got)),
            }
        out["per_sf"][sf] = row
        print(f"# {sf}: fold {row['fold_sec']}s vs rebuild "
              f"{row['rebuild_sec']}s ({row['speedup']}x), "
              f"{n_delta} delta events", file=sys.stderr, flush=True)
    print(json.dumps(out))


def _sweep(spark, sf: str) -> None:
    import tempfile

    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.incremental_dedup import (
        _AFFECTED_REBUILD_FRACTION,
        build_dedup_index,
        cdc_dedup_index_update,
        read_components,
    )

    docs = table(spark, sf, "documents").select("doc_id", "text")
    out: dict = {
        "metric": "dedup_cdc_delta_width_sweep",
        "unit": "sec",
        "sf_dir": sf,
        "reroute_fraction": _AFFECTED_REBUILD_FRACTION,
        "rows": [],
    }
    for rate in (0.02, 0.05, 0.10, 0.20, 0.30):
        mod = max(3, int(round(1.0 / rate)))
        is_base = F.col("doc_id") % mod != 2
        is_upd = F.col("doc_id") % mod == 0
        is_del = F.col("doc_id") % mod == 1
        delta = docs.filter((~is_base) | is_upd | is_del).select(
            F.when(~is_base, F.lit("INSERT"))
            .when(is_upd, F.lit("UPDATE"))
            .otherwise(F.lit("DELETE"))
            .alias("operation"),
            "doc_id",
            F.when(is_upd, F.concat(F.col("text"), F.lit(" upd")))
            .otherwise(F.col("text"))
            .alias("text"),
        ).localCheckpoint(eager=True)
        n_delta = delta.count()
        with tempfile.TemporaryDirectory() as tmp:
            idx = os.path.join(tmp, "idx")
            build_dedup_index(spark, docs.filter(is_base), idx)  # untimed
            t0 = time.perf_counter()
            folded = cdc_dedup_index_update(spark, idx, delta)
            folded.count()
            fold_sec = time.perf_counter() - t0

            post = docs.filter(~is_del).select(
                "doc_id",
                F.when(is_upd, F.concat(F.col("text"), F.lit(" upd")))
                .otherwise(F.col("text"))
                .alias("text"),
            )
            idx2 = os.path.join(tmp, "rebuild")
            t0 = time.perf_counter()
            build_dedup_index(spark, post, idx2)
            rebuilt = read_components(spark, idx2)
            rebuilt.count()
            rebuild_sec = time.perf_counter() - t0
            got = sorted(map(tuple, folded.select("v", "component").collect()))
            want = sorted(map(tuple, rebuilt.select("v", "component").collect()))
            assert got == want, f"fold != rebuild at rate {rate}"
        row = {
            "rate_per_class": rate,
            "delta_events": n_delta,
            "fold_sec": round(fold_sec, 2),
            "rebuild_sec": round(rebuild_sec, 2),
            "ratio_fold_over_rebuild": round(fold_sec / rebuild_sec, 2),
        }
        out["rows"].append(row)
        print(f"# rate {rate}: fold {row['fold_sec']}s vs rebuild "
              f"{row['rebuild_sec']}s (ratio {row['ratio_fold_over_rebuild']})",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

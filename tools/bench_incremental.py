#!/usr/bin/env python
"""Incremental-dedup economics (VERDICT r4 #5): does folding a delta
beat recomputing the whole corpus?

The incremental family's entire pitch is crawl-over-crawl maintenance:
at 100 TB you index once and fold each new crawl, because re-running
batch dedup over everything-so-far grows with the CORPUS while the fold
grows with the DELTA. This tool measures that crossover on real data:

  base = first 90% of documents (indexed once, untimed — the sunk cost)
  delta = last 10%
  timed A: incremental_dedup_update(index, delta)      — the fold
  timed B: batch ground truth over base+delta from scratch
           (gram/band/verify/components — what a no-index pipeline
           re-pays every crawl)

Prints ONE JSON line:
  {"metric": "incremental_fold_vs_batch", "sf_dir": ..., "n_docs": N,
   "fold_sec": A, "batch_sec": B, "speedup": B/A, ...}

Usage: python tools/bench_incremental.py [sf_dir ...]
  default sf dirs: /root/testdata/sf0.1 and ./.sf1 (if present)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.components import connected_components
    from python_cdc_spark.operators.incremental_dedup import (
        _delta_tables,
        _verify_pairs,
        build_dedup_index,
        incremental_dedup_update,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)  # scan cost out of both sides
    n_docs = docs.count()
    max_id = docs.agg(F.max("doc_id")).first()[0]
    boundary = (int(max_id) * 9) // 10
    base = docs.filter(F.col("doc_id") < boundary)
    delta = docs.filter(F.col("doc_id") >= boundary)
    n_delta = delta.count()

    tmp = tempfile.mkdtemp(prefix="inc_bench_")
    try:
        build_dedup_index(spark, base, tmp)  # sunk cost, untimed

        t0 = time.perf_counter()
        fold_comp = incremental_dedup_update(spark, tmp, delta)
        n_fold = fold_comp.count()
        fold_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        cells, bands, sizes = _delta_tables(docs, "text", "doc_id")
        x, y = bands.alias("x"), bands.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        pairs = _verify_pairs(cand, cells, sizes, 0.5)
        n_batch = connected_components(pairs, "id_a", "id_b").count()
        batch_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert n_fold == n_batch, f"fold/batch row mismatch {n_fold} != {n_batch}"
    return {
        "sf_dir": sf_dir,
        "n_docs": int(n_docs),
        "n_delta": int(n_delta),
        "component_rows": int(n_fold),
        "fold_sec": round(fold_sec, 3),
        "batch_sec": round(batch_sec, 3),
        "speedup": round(batch_sec / fold_sec, 3),
    }


def _measure_rollup(spark, sf_dir: str) -> dict:
    """Cube maintenance economics: refresh(10% delta) vs full rebuild.

    Same shape as the dedup measurement — the refresh reads the stored
    partials + the delta (O(delta + cube)); the rebuild re-aggregates
    the whole fact table. Equality of the two cubes' rewrite answers is
    asserted inline (incl. the HLL distinct measure)."""
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.plans.rollup import RollupCatalog

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate",
    ).localCheckpoint(eager=True)
    n_rows = li.count()
    max_key = li.agg(F.max("l_orderkey")).first()[0]
    boundary = (int(max_key) * 9) // 10
    base = li.filter(F.col("l_orderkey") < boundary)
    delta = li.filter(F.col("l_orderkey") >= boundary)
    n_delta = delta.count()

    dims = {
        "ship_year": "year(l_shipdate)",
        "l_returnflag": "l_returnflag",
        "l_linestatus": "l_linestatus",
    }
    meas = {
        "rev": ("sum", "l_extendedprice * (1 - l_discount)"),
        "n": ("count", "1"),
        "max_qty": ("max", "l_quantity"),
        "parts": ("hll", "l_partkey"),
    }
    tmp = tempfile.mkdtemp(prefix="rollup_bench_")
    try:
        inc = RollupCatalog(spark, os.path.join(tmp, "inc"))
        inc.define("c", base, dims, meas, fingerprint="base")  # sunk cost

        t0 = time.perf_counter()
        inc.refresh("c", delta)
        fold_sec = time.perf_counter() - t0

        full = RollupCatalog(spark, os.path.join(tmp, "full"))
        t0 = time.perf_counter()
        full.define("c", li, dims, meas, fingerprint="full")
        rebuild_sec = time.perf_counter() - t0

        req = (["l_returnflag"], ["rev", "n", "max_qty", "parts"])
        a = sorted(map(tuple, inc.rewrite(*req).collect()))
        b = sorted(map(tuple, full.rewrite(*req).collect()))
        assert a == b, "refresh != rebuild"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "sf_dir": sf_dir,
        "n_rows": int(n_rows),
        "n_delta": int(n_delta),
        "refresh_sec": round(fold_sec, 3),
        "rebuild_sec": round(rebuild_sec, 3),
        "speedup": round(rebuild_sec / fold_sec, 3),
    }


def _measure_cdc_rollup(spark, sf_dir: str) -> dict:
    """CDC-maintained cube economics (r6): refresh_cdc(1% I/U/D delta)
    vs full rebuild over the final state — BOTH fold plans measured:
    the algebraic path (sum/count cube, no state read) and the
    affected-group rebuild path (max + HLL measures, state pruned by
    the delta's dims). Equality vs the rebuild asserted inline."""
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.plans.rollup import RollupCatalog

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate",
    ).localCheckpoint(eager=True)
    n_rows = li.count()
    # the CDC batch: ~0.5% of orderkeys deleted, ~0.5% repriced
    km = F.pmod(F.col("l_orderkey"), F.lit(200))
    touched_del = li.filter(km == 0)
    touched_upd = li.filter(km == 1)
    updated = touched_upd.withColumn(
        "l_extendedprice", F.col("l_extendedprice") * 1.05
    )
    state1 = (
        li.filter((km != 0) & (km != 1)).unionByName(updated)
    ).localCheckpoint(eager=True)
    minus = touched_del.unionByName(touched_upd).localCheckpoint(eager=True)
    plus = updated.localCheckpoint(eager=True)
    n_delta = minus.count() + plus.count()

    dims = {
        "ship_year": "year(l_shipdate)",
        "l_returnflag": "l_returnflag",
        "l_linestatus": "l_linestatus",
    }
    meas_sc = {"rev": ("sum", "l_extendedprice * (1 - l_discount)"),
               "n": ("count", "1")}
    meas_full = dict(meas_sc, max_qty=("max", "l_quantity"),
                     parts=("hll", "l_partkey"))
    out = {"sf_dir": sf_dir, "n_rows": int(n_rows), "n_delta": int(n_delta)}
    tmp = tempfile.mkdtemp(prefix="cdc_rollup_bench_")
    try:
        for label, meas, state_arg in (
            ("algebraic", meas_sc, None),
            ("state_rebuild", meas_full, state1),
        ):
            inc = RollupCatalog(spark, os.path.join(tmp, f"inc_{label}"))
            inc.define("c", li, dims, meas, fingerprint="s0")  # sunk cost

            t0 = time.perf_counter()
            inc.refresh_cdc("c", plus, minus, state=state_arg)
            fold_sec = time.perf_counter() - t0

            full = RollupCatalog(spark, os.path.join(tmp, f"full_{label}"))
            t0 = time.perf_counter()
            full.define("c", state1, dims, meas, fingerprint="s1")
            rebuild_sec = time.perf_counter() - t0

            req = (["l_returnflag"], sorted(meas))
            a = sorted(map(tuple, inc.rewrite(*req).collect()))
            b = sorted(map(tuple, full.rewrite(*req).collect()))
            assert a == b, f"cdc refresh != rebuild ({label})"
            out[label] = {
                "refresh_sec": round(fold_sec, 3),
                "rebuild_sec": round(rebuild_sec, 3),
                "speedup": round(rebuild_sec / fold_sec, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _measure_cdc_rollup_partitioned_60m(spark, sf1_dir: str) -> dict:
    """VERDICT r6 #1 done-criterion: the ENGINE-enforced partition-
    pruned refresh (state hive-partitioned by a dim-derived column,
    refresh_cdc(state_path=..., state_partition_dim=...)) vs a full
    rebuild over the same on-disk state, at 60M rows with a delta
    localized to one ship-year. The r6 measurement (caller pre-pruned
    an IN-MEMORY state — the filter still scanned everything upstream)
    broke even at 1.02x; reading only the affected subdirectories is
    the real contract."""
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.plans.rollup import RollupCatalog

    li1 = table(spark, sf1_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_returnflag", "l_linestatus", "l_shipdate",
    ).withColumn(
        "ship_month", F.year("l_shipdate") * 100 + F.month("l_shipdate")
    ).drop("l_shipdate")
    copies = [
        li1.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
        )
        for i in range(10)
    ]
    li = copies[0]
    for c in copies[1:]:
        li = li.unionByName(c)

    tmp = tempfile.mkdtemp(prefix="cdc_rollup_part_")
    try:
        base_dir = os.path.join(tmp, "base")
        li.write.partitionBy("ship_month").parquet(base_dir)  # sunk: apply-side state
        base = spark.read.parquet(base_dir)
        n_rows = base.count()
        months = sorted(
            r[0] for r in base.select("ship_month").distinct().collect()
        )
        hot = months[-14]  # a full interior month — the real CDC shape
        pred = (F.col("ship_month") == hot) & (F.col("l_orderkey") % 8 == 0)
        minus = base.filter(pred).localCheckpoint(eager=True)
        plus = minus.withColumn(
            "l_extendedprice", F.col("l_extendedprice") * 1.05
        ).localCheckpoint(eager=True)
        n_delta = minus.count() + plus.count()

        state_dir = os.path.join(tmp, "state1")
        base.filter(~pred).unionByName(plus).write.partitionBy(
            "ship_month"
        ).parquet(state_dir)  # sunk: the post-apply state the pipeline maintains

        dims = {"ship_month": "ship_month", "l_returnflag": "l_returnflag",
                "l_linestatus": "l_linestatus"}
        meas = {"rev": ("sum", "l_extendedprice * (1 - l_discount)"),
                "n": ("count", "1"), "max_qty": ("max", "l_quantity"),
                "parts": ("hll", "l_partkey")}

        inc = RollupCatalog(spark, os.path.join(tmp, "inc"))
        inc.define("c", base, dims, meas, fingerprint="s0")  # sunk cost

        t0 = time.perf_counter()
        inc.refresh_cdc(
            "c", plus, minus,
            state_path=state_dir, state_partition_dim="ship_month",
        )
        refresh_sec = time.perf_counter() - t0
        assert inc.last_refresh_plan == "partition_pruned_fold"
        files_read = len(inc.last_refresh_input_files)
        files_total = len(spark.read.parquet(state_dir).inputFiles())
        assert all(
            f"ship_month={hot}" in f for f in inc.last_refresh_input_files
        )

        state1 = spark.read.parquet(state_dir)
        full = RollupCatalog(spark, os.path.join(tmp, "full"))
        t0 = time.perf_counter()
        full.define("c", state1, dims, meas, fingerprint="s1")
        rebuild_sec = time.perf_counter() - t0

        req = (["l_returnflag"], sorted(meas))
        a = sorted(map(tuple, inc.rewrite(*req).collect()))
        b = sorted(map(tuple, full.rewrite(*req).collect()))
        assert a == b, "partition-pruned cdc refresh != rebuild"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "n_rows": int(n_rows),
        "n_delta": int(n_delta),
        "hot_month": int(hot),
        "state_files_read": files_read,
        "state_files_total": files_total,
        "refresh_sec": round(refresh_sec, 3),
        "rebuild_sec": round(rebuild_sec, 3),
        "speedup": round(rebuild_sec / refresh_sec, 3),
    }


def main() -> None:
    from python_cdc_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--partitioned-only" in sys.argv:
        # re-measure just the engine-enforced partition-pruned refresh
        # (60M); merges into the committed artifact's key
        spark = get_spark(app_name="bench_incremental_partitioned")
        spark.sparkContext.setLogLevel("ERROR")
        res = _measure_cdc_rollup_partitioned_60m(
            spark, os.path.join(repo, ".sf1")
        )
        print(json.dumps({"cdc_rollup_partitioned_60m": res}))
        return

    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.1",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
            ),
        )
        if os.path.isdir(d)
    ]
    spark = get_spark(app_name="bench_incremental")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    rollup_results = []
    cdc_results = []
    for d in dirs:
        r = _measure(spark, d)
        print(f"# {d}: fold {r['fold_sec']}s vs batch {r['batch_sec']}s "
              f"(speedup {r['speedup']}x)", file=sys.stderr)
        results.append(r)
        rr = _measure_rollup(spark, d)
        print(f"# {d} rollup: refresh {rr['refresh_sec']}s vs rebuild "
              f"{rr['rebuild_sec']}s (speedup {rr['speedup']}x)",
              file=sys.stderr)
        rollup_results.append(rr)
        cr = _measure_cdc_rollup(spark, d)
        print(f"# {d} cdc rollup: {cr['algebraic']} | {cr['state_rebuild']}",
              file=sys.stderr)
        cdc_results.append(cr)
    print(json.dumps({
        "metric": "incremental_fold_vs_batch",
        "runs": results,
        "rollup_runs": rollup_results,
        "cdc_rollup_runs": cdc_results,
    }))


if __name__ == "__main__":
    main()

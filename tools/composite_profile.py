#!/usr/bin/env python
"""Phase profile for cdc_pipeline_composite (VERDICT r13 "Next round" #1).

Re-runs the composite's body phase by phase and attributes per-phase
Spark job counts (deterministic) and wall time (drift-prone):
head/fixture scalars, decode+origins+feed checkpoint, the two apply
folds, state write + cube define, signed deltas + refresh, rewrite.

Jobs are counted as deltas of the DAGScheduler's job-id counter rather
than per-group — the r14 body submits independent jobs from worker
threads (concurrent folds/writes, guide §2.6), and job groups are
thread-local, so a group-based count would miss them. The counter
counts every job in the interval; run on an otherwise idle session.

The body mirrors queries/cdc_queries.py::cdc_pipeline_composite (warm
fixture path + _composite_from_wire) exactly; any drift between the two
is a bug in THIS tool, which exists only to produce the committed
receipt plans/r14/COMPOSITE_PROFILE_*.json.

Usage: python tools/composite_profile.py <reps>
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_once(spark, sf_dir, out):
    import hashlib

    from pyspark.sql import functions as F

    from python_cdc_spark import fsops
    from python_cdc_spark.cdc.apply import apply_changes_all_tables
    from python_cdc_spark.cdc.ivm import signed_state_deltas
    from python_cdc_spark.cdc.origins import annotate_origins, filter_by_origin
    from python_cdc_spark.cdc.pgoutput import decode_frames
    from python_cdc_spark.operators.ann_index import source_fingerprint
    from python_cdc_spark.plans.rollup import RollupCatalog, finalize_sum_double
    from python_cdc_spark.queries.cdc_queries import cdc_pipeline_composite

    sc = spark.sparkContext
    phases = []

    def next_job_id() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    def phase(name, fn):
        sc.setJobDescription(f"composite:{name}")
        j0 = next_job_id()
        t0 = time.perf_counter()
        r = fn()
        wall = time.perf_counter() - t0
        jobs = next_job_id() - j0
        sc.setJobDescription(None)
        phases.append({"phase": name, "wall": round(wall, 3), "jobs": jobs})
        return r

    # make sure the wire fixture is warm (one full run, untracked) so the
    # profile measures the steady-state invocation the bench times
    cdc_pipeline_composite(spark, sf_dir).count()

    cache_key = hashlib.md5(
        os.path.abspath(sf_dir.rstrip("/")).encode()
    ).hexdigest()[:16]
    root = os.path.join(".rollup_cache", cache_key + "_e2e")
    wire_dir = os.path.join(root, "wire.parquet")

    def fixture_scalars():
        meta = fsops.read_json(os.path.join(wire_dir, "_meta.json"))
        return 8 * (int(meta["derived"]["max_eid"]) // 2)

    s_lsn = phase("fixture_scalars", fixture_scalars)

    frames = spark.read.schema("lsn bigint, ts timestamp, frame binary").parquet(
        wire_dir
    )

    def build_feed():
        decoded = decode_frames(spark, frames)
        ann = annotate_origins(spark, decoded, frames, bucket_width=4096)
        return (
            filter_by_origin(ann, "none")
            .withColumn(
                "key",
                F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"]),
            )
            .localCheckpoint(eager=True)
        )

    feed = phase("decode_origins_feed", build_feed)

    band = F.pmod(F.col("key").cast("bigint"), F.lit(4)).cast("int")
    is_delta = (F.col("lsn") > s_lsn) & F.coalesce(band == 0, F.lit(False))

    def typed(state):
        vals = F.col("values")
        return state.select(
            F.col("table").alias("tbl"),
            F.col("key"),
            F.pmod(F.col("key").cast("bigint"), F.lit(4)).cast("int").alias(
                "key_band"
            ),
            F.when(vals["amount_usd"].isNotNull(), F.lit("amount_usd"))
            .otherwise(F.lit("amount"))
            .alias("col_name"),
            F.coalesce(vals["amount_usd"], vals["amount"])
            .cast("double")
            .alias("value"),
            F.col("last_lsn"),
        )

    from concurrent.futures import ThreadPoolExecutor

    def _fold(src):
        return typed(
            apply_changes_all_tables(src, "key", plan="array_fold")
        ).localCheckpoint(eager=True)

    def folds():
        with ThreadPoolExecutor(max_workers=2) as pool:
            f0 = pool.submit(_fold, feed.filter(~is_delta))
            f1 = pool.submit(_fold, feed)
            return f0.result(), f1.result()

    state0, state1 = phase("apply_folds_concurrent", folds)

    state_dir = os.path.join(root, "state1")
    cat = RollupCatalog(spark, os.path.join(root, "cubes"))

    def write_and_define():
        with ThreadPoolExecutor(max_workers=2) as pool:
            fw = pool.submit(
                lambda: state1.write.mode("overwrite")
                .partitionBy("key_band")
                .parquet(state_dir)
            )
            fd = pool.submit(
                cat.define,
                "e2e_cube",
                state0,
                dims={"key_band": "key_band", "tbl": "tbl", "col_name": "col_name"},
                measures={
                    "n_rows": ("count", "1"),
                    "sum_value": ("sum", "value"),
                    "max_lsn": ("max", "last_lsn"),
                },
                fingerprint=source_fingerprint(
                    os.path.join(sf_dir, "events.parquet")
                ),
            )
            fw.result()
            fd.result()

    phase("state_write_and_define", write_and_define)

    def refresh():
        plus, minus = signed_state_deltas(
            state0,
            state1,
            feed.filter(is_delta).select(F.col("table").alias("tbl"), "key"),
            ["tbl", "key"],
        )
        cat.refresh_cdc(
            "e2e_cube",
            plus,
            minus,
            state_path=state_dir,
            state_partition_dim="key_band",
            state_schema=state1.schema,
        )

    phase("deltas_refresh_cdc", refresh)

    def rewrite_count():
        o = cat.rewrite(
            dims=["key_band", "tbl", "col_name"],
            measures=["n_rows", "sum_value", "max_lsn"],
        )
        return (
            finalize_sum_double(o, ["sum_value"])
            .select(
                "key_band",
                "tbl",
                "col_name",
                F.col("n_rows").cast("long").alias("n_rows"),
                "sum_value",
                F.col("max_lsn").cast("long").alias("max_lsn"),
            )
            .count()
        )

    n = phase("rewrite_count", rewrite_count)
    out.append({"rows": n, "phases": phases})


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_cdc_spark.io import enable_table_cache
    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name="composite_profile")
    spark.sparkContext.setLogLevel("ERROR")
    enable_table_cache(spark, sf_dir)

    runs = []
    for rep in range(reps):
        profile_once(spark, sf_dir, runs)
        print(f"# rep{rep}: {json.dumps(runs[-1])}", file=sys.stderr, flush=True)

    agg = {}
    for run in runs:
        for p in run["phases"]:
            agg.setdefault(p["phase"], {"walls": [], "jobs": []})
            agg[p["phase"]]["walls"].append(p["wall"])
            agg[p["phase"]]["jobs"].append(p["jobs"])
    summary = {
        ph: {
            "wall_median": round(statistics.median(v["walls"]), 3),
            "jobs": v["jobs"],
        }
        for ph, v in agg.items()
    }
    total_jobs = sum(v["jobs"][0] for v in agg.values())
    print(
        json.dumps(
            {"summary": summary, "total_jobs_rep0": total_jobs, "runs": runs}
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timings are end-to-end per query (plan + execute + a count-style sink
that forces full materialization without driver-side row transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customers",
    "revenue_by_nation_region",
    # window/analytic
    "window_topk_per_group",
    "window_running_total",
    "asof_join_latest_click",
    "sessionize_events",
    # CDC flagship
    "cdc_apply_changes",
    "cdc_scd2_history",
    # LLM pipeline
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_verified",
    "text_quality_score",
    "text_tf_topk",
    "similarity_brute_topk",
    "similarity_ann_lsh_topk",
    "similarity_ivf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_cdc_spark.session import get_spark
    from python_cdc_spark.queries import QUERIES

    spark = get_spark(app_name="python_cdc_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the engine, not first-touch costs
    QUERIES["q6_forecast_revenue"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        n = spec.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

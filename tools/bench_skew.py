#!/usr/bin/env python
"""Skew proof at sf1 (VERDICT r3 item #6): MEASURE the skew mitigations
in operators/skew.py against a genuinely pathological key distribution
instead of asserting they help.

Input: ``.sf1/events_zipf.parquet`` from tools/make_sf_scale.py — the
sf1 events with user_id redrawn so ONE key holds 50% of all rows and
the rest spread uniformly over 100k cold keys.

Measured (wall-clock, local[32]):

1. **Aggregation** — direct ``groupBy(user_id).agg(sum,count)`` vs
   ``salted_groupby``. Expectation to test honestly: Spark's hash
   aggregate already does map-side partial aggregation, so for
   decomposable aggregates the hot key collapses to one partial per
   task BEFORE the shuffle and salting should NOT win — the salt is for
   state-heavy aggregates and engines without partial agg. Whatever the
   number says, it goes in SCALE.md.

2. **Join** — skewed fact ⋈ 100k-row user dim, forced SMJ
   (broadcast off) with (a) AQE off: the hot key's 50% of rows land on
   ONE sort-merge task; (b) AQE on with skew-join splitting; (c)
   ``replicated_skew_join`` (explicit salt; works even where AQE's
   splitter can't, e.g. pre-Spark-3 or non-SMJ plans).

Correctness is asserted inline (salted == direct, replicated == plain)
— a benchmark that silently changes answers measures nothing.

Prints one JSON line. Usage: python tools/bench_skew.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 4), n


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
    )
    from pyspark.sql import functions as F

    from python_cdc_spark.operators.skew import replicated_skew_join, salted_groupby
    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name="bench_skew")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(os.path.join(sf1_dir, "events_zipf.parquet"))
    ev = ev.select("event_id", "user_id", "value").localCheckpoint()  # isolate op cost
    total = ev.count()
    hot = ev.filter(F.col("user_id") == 0).count()
    print(f"# rows={total} hot_share={hot / total:.3f}", file=sys.stderr)

    out: dict = {"metric": "skew_mitigation_sf1", "unit": "sec",
                 "rows": total, "hot_share": round(hot / total, 4)}

    # --- 1. aggregation: direct vs salted ------------------------------
    # double SUM is order-dependent (at 10M rows the two-phase partial
    # order visibly shifts the last ulps); route through decimal like
    # every oracle-gated sum in this repo so equality is EXACT
    val = F.col("value").cast("decimal(18,6)")
    aggs = [
        (val, "sum", "sum_value"),
        (F.lit(1), "count", "n"),
    ]
    direct = lambda: ev.groupBy("user_id").agg(  # noqa: E731
        F.sum(val).alias("sum_value"), F.count(F.lit(1)).alias("n")
    )
    salted = lambda: salted_groupby(ev, ["user_id"], aggs, salt_buckets=16)  # noqa: E731
    # correctness first (also warms caches for fair timing)
    d_rows = {r["user_id"]: (r["sum_value"], r["n"]) for r in direct().collect()}
    s_rows = {r["user_id"]: (r["sum_value"], r["n"]) for r in salted().collect()}
    assert d_rows == s_rows, "salted_groupby changed the answer"
    t_direct, _ = _timed(lambda: direct().count())
    t_salted, _ = _timed(lambda: salted().count())
    out["agg_direct"] = t_direct
    out["agg_salted"] = t_salted
    print(f"# agg: direct {t_direct:.2f}s salted {t_salted:.2f}s", file=sys.stderr)

    # --- 2. join: one hot key vs a 100k dim ----------------------------
    dim = (
        spark.range(0, 100_000)
        .select(F.col("id").alias("user_id"), (F.col("id") % 7).alias("segment"))
        .localCheckpoint()
    )

    def set_conf(aqe: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        # force the shuffle join path: skew is a shuffle problem
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def plain() -> int:
        return ev.join(dim, "user_id").groupBy("segment").count().count()

    def replicated() -> int:
        return (
            replicated_skew_join(ev, dim, "user_id", salt_buckets=16)
            .groupBy("segment")
            .count()
            .count()
        )

    # correctness: replicated join == plain join row counts per segment
    set_conf(aqe=True)
    p = {r["segment"]: r["count"] for r in ev.join(dim, "user_id").groupBy("segment").count().collect()}
    r = {
        r["segment"]: r["count"]
        for r in replicated_skew_join(ev, dim, "user_id").groupBy("segment").count().collect()
    }
    assert p == r, "replicated_skew_join changed the answer"

    set_conf(aqe=False)
    out["join_smj_aqe_off"], _ = _timed(plain)
    set_conf(aqe=True)
    out["join_smj_aqe_on"], _ = _timed(plain)
    out["join_replicated"], _ = _timed(replicated)
    # restore defaults for anything run after us in-session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    print(
        f"# join: aqe-off {out['join_smj_aqe_off']:.2f}s "
        f"aqe-on {out['join_smj_aqe_on']:.2f}s "
        f"replicated {out['join_replicated']:.2f}s",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Pins for the analytics pack's r5 fixes: the distributed exact NTILE
(vs Spark's own single-partition ntile, including ties and n < k), the
mega-basket cap in part_affinity_lift, the CUSUM p_0 = 0 floor, and the
degenerate-bounds histogram guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from python_cdc_spark.operators.ranking import (
    with_distributed_ntile,
    with_global_row_number,
)
from python_cdc_spark.queries.analytics import BASKET_CAP, capped_basket_items


def _ntile_reference(spark, rows, k, ascending):
    df = spark.createDataFrame(rows, "id long, v double")
    order = [F.col("v").asc() if ascending else F.col("v").desc(), F.col("id").asc()]
    w = Window.orderBy(*order)
    return {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(k).over(w).alias("t")).collect()
    }


@pytest.mark.parametrize(
    "n,k,ascending,num_buckets",
    [
        (97, 5, True, 8),    # n % k != 0 → unequal tile sizes
        (100, 4, False, 8),  # exact split, descending
        (3, 5, True, 4),     # n < k → one row per tile
        (64, 5, True, 1),    # single bucket → degenerate boundary list
    ],
)
def test_distributed_ntile_matches_spark_ntile(spark, n, k, ascending, num_buckets):
    # deterministic values with heavy ties (v repeats every 7 ids) so
    # tie groups span bucket boundaries if the bucketing mishandles them
    rows = [(i, float((i * 37) % 7)) for i in range(n)]
    expect = _ntile_reference(spark, rows, k, ascending)
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["t"]
        for r in with_distributed_ntile(
            df, k, "v", ascending=ascending, tiebreak=("id",), out="t",
            num_buckets=num_buckets,
        ).collect()
    }
    assert got == expect


def test_global_row_number_is_exact_permutation(spark):
    rows = [(i, float(i % 13)) for i in range(211)]
    df = spark.createDataFrame(rows, "id long, v double")
    ranked, total = with_global_row_number(
        df, "v", ascending=True, tiebreak=("id",), out="rn", num_buckets=16
    )
    assert total == 211
    got = sorted((r["rn"], r["v"], r["id"]) for r in ranked.collect())
    assert [g[0] for g in got] == list(range(1, 212))
    # rank order must equal (v, id) order
    assert got == sorted(got, key=lambda t: (t[1], t[2]))


def test_mega_basket_cap_bounds_pairs(spark):
    """One order holding 500 parts (the mega-basket blowup) must be
    capped to the BASKET_CAP lowest partkeys before pair generation."""
    rows = [(1, p, 0) for p in range(500)] + [(2, p, 0) for p in (7, 9)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long, x int")
    items = capped_basket_items(li).collect()
    by_order = {}
    for r in items:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    assert by_order[1] == set(range(BASKET_CAP))  # lowest partkeys, deterministic
    assert by_order[2] == {7, 9}  # small basket untouched


def test_cusum_floors_running_min_at_zero(spark):
    """All-positive deviation prefix (immediate upward drift): the
    statistic must include the implicit p_0 = 0 term — x=(2,3) around a
    zero mean gives cusum=(2,5), not (0,3) (ADVICE r4)."""
    from tests.conftest import SF_CORRECT
    from python_cdc_spark.queries import QUERIES

    # Direct formula check on a minimal frame first.
    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, 3.0)], "et string, t int, dev double"
    )
    w = (
        Window.partitionBy("et")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        df.withColumn("p", F.sum("dev").over(w))
        .withColumn("cusum", F.col("p") - F.least(F.lit(0.0), F.min("p").over(w)))
        .orderBy("t")
        .collect()
    )
    assert [r["cusum"] for r in out] == [2.0, 5.0]

    # And the registered query must obey the recursion on real data:
    # s_t = max(0, s_{t-1} + dev_t), recomputed row-by-row per type.
    # Tolerance is loose (1e-2) because the query decimal-rounds the
    # prefix sums to 4 digits for cross-engine exactness while this
    # reference recursion uses raw floats; engine-exactness itself is
    # the DuckDB oracle's job. What this pins is the SHAPE: an
    # all-positive prefix must not be zeroed (3193/3385 rows diverged
    # before the p_0 floor fix; ~1e-5 drift after).
    res = QUERIES["events_cusum_drift"].fn(spark, SF_CORRECT)
    rows = res.orderBy("event_type", "bucket_ts").collect()
    state: dict[str, float] = {}
    mean_dev: dict[str, list] = {}
    for r in rows:
        mean_dev.setdefault(r["event_type"], []).append(r["sum_value"])
    means = {k: sum(v) / len(v) for k, v in mean_dev.items()}
    for r in rows:
        et = r["event_type"]
        s = max(0.0, state.get(et, 0.0) + (r["sum_value"] - means[et]))
        state[et] = s
        assert r["cusum"] == pytest.approx(s, abs=1e-2), (et, r["bucket_ts"])


def test_histogram_degenerate_bounds_single_bucket(spark):
    """max == min must yield bucket 1 for every row, not NaN/overflow
    (ADVICE r4). Exercise the registered query's bucketing expression
    shape on a constant column."""
    ev = spark.createDataFrame(
        [("t", 5.0), ("t", 5.0), ("u", 5.0)], "event_type string, value double"
    )
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    width_bucket = (
        F.floor((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 16)
        + 1
    ).cast("int")
    out = (
        ev.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.when(F.col("mx") == F.col("mn"), F.lit(1))
            .otherwise(width_bucket)
            .alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .count()
        .collect()
    )
    assert {(r["event_type"], r["bucket"]) for r in out} == {("t", 1), ("u", 1)}


@pytest.mark.parametrize("ascending,num_buckets", [(False, 8), (True, 1)])
def test_global_prefix_sum_matches_window_sum(spark, ascending, num_buckets):
    """The distributed running total must equal Spark's own
    single-partition window sum, including heavy ties and the
    degenerate one-bucket case."""
    rows = [(i, int((i * 31) % 11) * 100) for i in range(157)]
    df = spark.createDataFrame(rows, "id long, cents long")
    from python_cdc_spark.operators.ranking import with_global_prefix_sum_long

    got_df, total = with_global_prefix_sum_long(
        df, "cents", "cents", ascending=ascending, tiebreak=("id",),
        out="cum", num_buckets=num_buckets,
    )
    got = {r["id"]: r["cum"] for r in got_df.collect()}
    order = [F.col("cents").asc() if ascending else F.col("cents").desc(),
             F.col("id").asc()]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.select("id", F.sum("cents").over(w).alias("cum")).collect()
    }
    assert got == want
    assert total == sum(c for _, c in rows)

"""Property-based tests: distributed connected components vs union-find,
and incremental aggregate maintenance vs sequential state replay, over
randomized inputs (the same §5.2 strategy as test_apply_property.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from python_cdc_spark.cdc.ivm import incremental_group_aggregate
from python_cdc_spark.operators.components import (
    connected_components,
    connected_components_star,
)

edges_st = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=20,
)


def _uf_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@pytest.mark.parametrize(
    "algo", [connected_components, connected_components_star]
)
@given(edges=edges_st)
def test_components_match_union_find(spark, algo, edges):
    df = spark.createDataFrame(edges, ["s", "d"])
    got = {r["v"]: r["component"] for r in algo(df, "s", "d").collect()}
    assert got == _uf_components(edges)


ops_st = st.lists(
    st.tuples(
        st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        st.sampled_from(["1", "2", "3"]),
        st.sampled_from(["a", "b"]),
        st.sampled_from(["1.0", "2.5", "4.25"]),
    ),
    min_size=1,
    max_size=24,
)


def _reference_agg(events):
    state: dict[str, tuple[str, float]] = {}
    for op, key, grp, val in events:
        if op == "DELETE":
            state.pop(key, None)
        else:
            state[key] = (grp, float(val))
    out: dict[str, tuple[int, float]] = {}
    for grp, val in state.values():
        n, s = out.get(grp, (0, 0.0))
        out[grp] = (n + 1, s + val)
    return {g: (n, round(s, 4)) for g, (n, s) in out.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events=ops_st)
def test_incremental_agg_matches_replay(spark, events):
    rows = [
        (key, lsn, op, None if op == "DELETE" else grp,
         None if op == "DELETE" else val)
        for lsn, (op, key, grp, val) in enumerate(events, start=1)
    ]
    feed = spark.createDataFrame(
        rows, "key string, lsn long, operation string, g string, v string"
    )
    got = {
        r["grp"]: (r["n_rows"], r["sum_value"])
        for r in incremental_group_aggregate(
            feed, key="key", lsn="lsn", op="operation",
            group_col="g", value_col="v",
        ).collect()
    }
    assert got == _reference_agg(events)

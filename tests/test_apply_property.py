"""Property-based test: apply_changes vs a sequential reference
interpreter over randomized CDC event sequences (SURVEY.md §5.2).

The reference model replays events one at a time in lsn order exactly as
a single-threaded consumer applying rows to a dict would — the ground
truth the distributed fold must reproduce under any partitioning.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from python_cdc_spark.cdc.apply import apply_changes
from python_cdc_spark.schemas import CDC_EVENT_SCHEMA, UNCHANGED_SENTINEL

KEYS = ["k1", "k2", "k3"]
COLS = ["a", "b", "c"]
VALUES = ["x", "y", None, UNCHANGED_SENTINEL]

event_st = st.tuples(
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.sampled_from(KEYS),
    st.dictionaries(st.sampled_from(COLS), st.sampled_from(VALUES), max_size=3),
)


def reference_apply(events):
    """Sequential single-threaded interpreter (the semantics of a naive
    consumer applying the feed row by row)."""
    state: dict[str, dict] = {}
    for lsn, (op, key, vals) in enumerate(events, start=1):
        if op == "DELETE":
            state.pop(key, None)
            continue
        row = state.setdefault(key, {})
        row["id"] = key
        for c, v in vals.items():
            if v == UNCHANGED_SENTINEL:
                continue  # TOASTed column: keep prior value
            row[c] = v
    return {k: dict(v) for k, v in state.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_st, min_size=1, max_size=25))
def test_apply_matches_sequential_reference(spark, events):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for lsn, (op, key, vals) in enumerate(events, start=1):
        new = None if op == "DELETE" else {**vals, "id": key}
        old = {"id": key} if op != "INSERT" else None
        rows.append(
            (lsn, op, "public", "t", COLS, old, new, t0 + dt.timedelta(seconds=lsn))
        )
    df = spark.createDataFrame(rows, CDC_EVENT_SCHEMA).withColumn(
        "key", F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"])
    )
    got = {
        r["key"]: {k: v for k, v in r["values"].items()}
        for r in apply_changes(df, "key").collect()
    }
    assert got == reference_apply(events)

"""Local re-implementation of the driver's oracle comparison.

Compares a Spark DataFrame with a DuckDB result: row count, column-name
set, and an order-insensitive comparison of values with columns sorted by
name — the strictest interpretation of the driver contract, so passing
here should imply passing the driver's hash check.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def spark_rows(df):
    cols = sorted(df.columns)
    # str-normalize AFTER type normalization so int-vs-float type skew
    # (e.g. floor() long vs double) fails here like it would in any
    # stringifying hash — Python's 5 == 5.0 would otherwise hide it
    return cols, sorted(
        tuple(str(_norm(r[c])) for c in cols) for r in df.collect()
    )


# DuckDB integer widths the driver's hash can match against Spark output.
# Spark emits INT (32) / BIGINT (64); DuckDB promotes integer SUMs to
# HUGEINT and smaller literals to TINYINT/SMALLINT — any of those widths
# hash differently driver-side even when the *values* are equal (this bit
# us twice: r1 q12_priority_class, r2 sessionize_events). Oracles must
# CAST to BIGINT/INTEGER explicitly.
_ALLOWED_INT_TYPES = {"BIGINT", "INTEGER"}
_DUCK_INT_TYPES = _ALLOWED_INT_TYPES | {
    "TINYINT", "SMALLINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
}


def duck_rows(con, sql):
    rel = con.sql(sql)
    names = list(rel.columns)
    bad = [
        (n, str(t).upper())
        for n, t in zip(names, rel.types)
        if str(t).upper() in _DUCK_INT_TYPES
        and str(t).upper() not in _ALLOWED_INT_TYPES
    ]
    assert not bad, (
        f"oracle emits non-BIGINT/INTEGER integer columns {bad}; "
        "str-normalization hides the width skew locally but the driver's "
        "hash encodes it - CAST(... AS BIGINT) in the oracle SQL"
    )
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(
        tuple(str(_norm(row[i])) for i in order) for row in rel.fetchall()
    )


def assert_matches_oracle(df, con, sql, name="query", approx=None,
                          on_oracle_start=None):
    """Exact match by default; ``approx=k`` rounds floats to k digits
    before comparing (for queries whose floating error is inherent).
    ``on_oracle_start`` fires after the Spark side has fully
    materialized, immediately before the DuckDB execution — sweep
    tools hang their oracle-only watchdog here so a slow SPARK query
    can never interrupt an idle DuckDB connection."""
    s_cols, s_rows = spark_rows(df)
    if on_oracle_start is not None:
        on_oracle_start()
    d_cols, d_rows = duck_rows(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )

    def maybe_round(rows):
        if approx is None:
            return rows
        return [
            tuple(round(v, approx) if isinstance(v, float) else v for v in r)
            for r in rows
        ]

    s_r, d_r = maybe_round(s_rows), maybe_round(d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_r, d_r)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"

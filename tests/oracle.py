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


def duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(
        tuple(str(_norm(row[i])) for i in order) for row in cur.fetchall()
    )


def assert_matches_oracle(df, con, sql, name="query", approx=None):
    """Exact match by default; ``approx=k`` rounds floats to k digits
    before comparing (for queries whose floating error is inherent)."""
    s_cols, s_rows = spark_rows(df)
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

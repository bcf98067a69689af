"""Differential test: every registered oracle-checkable query must match
DuckDB exactly at sf0.01 — the same bar as the driver's t2 gate."""

from __future__ import annotations

import pytest

from python_cdc_spark.queries import QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle import assert_matches_oracle

ORACLE_CHECKED = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_CORRECT)
    assert_matches_oracle(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_CORRECT)
    n = df.count()
    assert n >= 0

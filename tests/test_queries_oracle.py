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


def test_registry_count_matches_coverage_doc():
    """COVERAGE.md is the audit trail — its registry total must track
    the actual registry (it went stale once: said 99 at 108)."""
    import os
    import re

    doc = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")
    ).read()
    m = re.search(r"Registry totals: (\d+) queries", doc)
    assert m, "COVERAGE.md lost its registry-totals line"
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md says {m.group(1)} queries; registry has {len(QUERIES)}"
    )

"""The local differ itself must catch the bug classes that slipped past it.

Round 1 (q12_priority_class) and round 2 (sessionize_events) both failed
the DRIVER's hash while the local differ showed green: DuckDB promotes
integer SUMs to HUGEINT, the differ stringifies values, and `str(5)` hides
the width skew the driver's hash encodes. These tests pin the hardening
in tests/oracle.py so a third occurrence is impossible.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle import duck_rows


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_uncast_hugeint_sum_rejected(con):
    # SUM over BIGINT types as HUGEINT in DuckDB - exactly the
    # sessionize_events / q12_priority_class failure shape.
    with pytest.raises(AssertionError, match="HUGEINT"):
        duck_rows(con, "SELECT SUM(i) AS s FROM range(5) t(i)")


def test_windowed_uncast_sum_rejected(con):
    with pytest.raises(AssertionError, match="HUGEINT"):
        duck_rows(
            con,
            "SELECT SUM(i) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS s "
            "FROM range(5) t(i)",
        )


def test_small_int_width_rejected(con):
    # TINYINT/SMALLINT outputs are also width-skewed vs Spark's INT.
    with pytest.raises(AssertionError, match="TINYINT"):
        duck_rows(con, "SELECT CAST(1 AS TINYINT) AS flag")


def test_cast_bigint_accepted(con):
    cols, rows = duck_rows(
        con, "SELECT CAST(SUM(i) AS BIGINT) AS s FROM range(5) t(i)"
    )
    assert cols == ["s"] and rows == [("10",)]


def test_cast_integer_accepted(con):
    cols, rows = duck_rows(con, "SELECT CAST(1 AS INTEGER) AS flag")
    assert cols == ["flag"] and rows == [("1",)]


def test_non_integer_types_untouched(con):
    cols, rows = duck_rows(
        con, "SELECT 'x' AS a, CAST(1.5 AS DOUBLE) AS b"
    )
    assert cols == ["a", "b"]

"""Shared fixtures: one SparkSession per test run, DuckDB oracle conn."""

from __future__ import annotations

import duckdb
import pytest

from python_cdc_spark.schemas import ANALYTIC_TABLES
from python_cdc_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="python_cdc_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # Views over the correctness scale factor, mirroring the driver.
    for name in ANALYTIC_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_CORRECT}/{name}.parquet')"
        )
    yield con
    con.close()

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
    # Explicit pool bound + spill cap (same practice as
    # tools/oracle_sweep.py): without a limit DuckDB sizes its pool off
    # total RAM and ignores the co-resident 32g Spark JVM — under
    # concurrent peaks (recursive-closure oracles) that surfaced as
    # transient 2 KB bad_alloc failures mid-suite (r10, twice). A
    # bounded pool spills instead.
    con.execute("SET memory_limit='48GB'")
    con.execute("SET max_temp_directory_size='32GB'")
    # Views over the correctness scale factor, mirroring the driver.
    for name in ANALYTIC_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_CORRECT}/{name}.parquet')"
        )
    yield con
    con.close()

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


@pytest.fixture()
def duck():
    """Fresh DuckDB connection per test. The former session-scoped
    connection accumulated allocator state across ~160 heavy oracles
    (recursive closures, ADC replays) and eventually failed a 2 KB
    allocation with ~120 GB free — a process-level malloc/mapping
    exhaustion a memory_limit did NOT prevent (r10, three incidents:
    ivfrq twice, events_histogram once, each passing in isolation).
    Per-test connections bound the state; the connect+views cost is
    ~50 ms. The pool/spill caps stay (oracle_sweep practice) so a
    single heavy oracle spills instead of competing with the 32g JVM."""
    con = duckdb.connect()
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

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real engine lives in ``python_cdc_spark/``; this module only adapts
its query registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from python_cdc_spark.queries import QUERIES
    from python_cdc_spark.session import tune_for_harness

    tune_for_harness(spark)
    return QUERIES["revenue_by_nation_region"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from python_cdc_spark.queries import query_map
    from python_cdc_spark.session import tune_for_harness

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_harness(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in query_map().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each oracle-checkable query."""
    from python_cdc_spark.queries import oracle_sql_map

    return oracle_sql_map()

"""Query registry: every operator exposed to the correctness harness.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
optional DuckDB oracle SQL string over the same parquet views. Names and
output column aliases MUST match between the two sides (the driver sorts
columns by name and hashes values).
"""

from python_cdc_spark.queries.registry import (  # noqa: F401
    QUERIES,
    oracle_sql_map,
    query_map,
    register,
)

# Importing these modules populates the registry.
from python_cdc_spark.queries import (  # noqa: F401, E402
    tpch,
    tpch_extra,
    relational,
    windows,
    cdc_queries,
    llm_text,
    llm_dedup,
    llm_similarity,
    streaming_queries,
    multimodal_queries,
)

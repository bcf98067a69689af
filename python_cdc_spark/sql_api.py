"""SQL-first surface: every engine capability reachable from plain SQL.

``register_all(spark, sf_dir)`` exposes the driver tables AND the
engine's derived relations as temp views, so a SQL-only user (the
"switching from the reference" persona) can work entirely through
``spark.sql``:

    cdc_feed            — the canonical CDC event stream
    cdc_current_state   — apply-changes materialization
    cdc_scd2            — type-2 history
    doc_quality         — text quality features per document
    doc_near_dups       — LSH-verified near-duplicate pairs
    embedding_buckets   — ANN LSH bucket assignment
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from python_cdc_spark.io import register_views


def register_all(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base + derived views; returns the registered names."""
    from pyspark.sql import functions as F

    from python_cdc_spark.cdc.apply import apply_changes
    from python_cdc_spark.cdc.feed import events_as_cdc_feed
    from python_cdc_spark.cdc.scd2 import scd2_history
    from python_cdc_spark.io import table
    from python_cdc_spark.operators.similarity import hyperplane_lsh_buckets
    from python_cdc_spark.queries.llm_dedup import dedup_lsh_verified
    from python_cdc_spark.queries.llm_text import text_quality_score
    from python_cdc_spark.schemas import ANALYTIC_TABLES

    register_views(spark, sf_dir)
    feed = events_as_cdc_feed(spark, sf_dir)
    derived = {
        "cdc_feed": feed,
        "cdc_current_state": apply_changes(feed, "key"),
        "cdc_scd2": scd2_history(feed, "key"),
        "doc_quality": text_quality_score(spark, sf_dir),
        "doc_near_dups": dedup_lsh_verified(spark, sf_dir),
        "embedding_buckets": hyperplane_lsh_buckets(
            table(spark, sf_dir, "embeddings")
        ),
    }
    for name, df in derived.items():
        df.createOrReplaceTempView(name)
    return list(ANALYTIC_TABLES) + list(derived)

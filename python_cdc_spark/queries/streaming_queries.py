"""Event-time window queries (E20–E22), oracle-checked in batch mode.

The same builders (``python_cdc_spark.streaming.windows``) run unchanged
on streaming DataFrames — tests drive that path with file sources and
``availableNow``; here the harness checks the windowing math itself
against DuckDB's ``time_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.queries.helpers import dec_sum, sql_dec_sum
from python_cdc_spark.queries.registry import register
from python_cdc_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@register(
    "streaming_tumbling_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dec_sum('value', 'total_value')}
    FROM events GROUP BY 1, 2, 3
    """,
    doc="E20/E22: tumbling 1-hour event-time windows per event type",
)
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return tumbling_window_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value"), "total_value")],
    )


@register(
    "streaming_sliding_1h_30m",
    oracle=f"""
    WITH slid AS (
      SELECT e.*,
             time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes'
               AS window_start
      FROM events e CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
      WHERE ts < time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes'
               + INTERVAL '1 hour'
    )
    SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events, {sql_dec_sum('value', 'total_value')}
    FROM slid GROUP BY 1, 2
    """,
    doc="E20: sliding 1h windows every 30m (each event in 2 windows)",
)
def streaming_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return sliding_window_agg(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value"), "total_value")],
    )


@register(
    "streaming_session_window_30m",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           COUNT(*) AS n_events,
           {sql_dec_sum('value', 'total_value')}
    FROM sess GROUP BY user_id, sid
    """,
    doc="E21: session windows (30 min gap) per user",
)
def streaming_session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window end = last event ts + gap (Spark semantics); the
    oracle reproduces sessions by gap-splitting with SQL windows."""
    ev = table(spark, sf_dir, "events")
    return session_window_agg(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value"), "total_value")],
    )

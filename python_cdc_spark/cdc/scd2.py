"""SCD2 history from a CDC feed (E19).

Each INSERT/UPDATE event opens a row version; the next event on the same
key (or a DELETE) closes it. The reference discards transaction/commit
time entirely (``/root/reference/utils/pg_output_parser.py:32-37``) and
stamps consumer wall-clock (``cdc_event.py:14``); here validity intervals
come from the event ``ts`` with ``lsn`` as the tiebreak/order, so history
is deterministic under replay.

Version ``values`` resolve the ``[unchanged]`` TOAST sentinel
(``pg_output_parser.py:112-113``) by carrying the cell forward from the
key's previous versions — the same coalescing ``apply_changes`` performs
for current state, so a history row is a faithful full row image, not a
wire artifact. Carry-forward resets at DELETE boundaries (a recreated
row starts from scratch). A sentinel with no prior value stays literal —
nothing to carry.

Shuffle shape at scale: the version window is one hash shuffle on key;
sentinel resolution explodes images to (key, column) cells and windows
on (key, generation, column) — spreading hot keys across their columns —
then regroups per version. No UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_cdc_spark.schemas import OP_DELETE, UNCHANGED_SENTINEL


def _resolve_sentinels(versions: DataFrame, key_col: str) -> DataFrame:
    """Replace sentinel cells in ``new_values`` with the most recent
    non-sentinel value of that column within the key's generation."""
    cells = versions.select(
        key_col, "__gen", "lsn", F.explode("new_values").alias("column", "value")
    )
    wc = (
        Window.partitionBy(key_col, "__gen", "column")
        .orderBy("lsn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Struct-wrap so a genuine NULL cell is carried (a bare last(...,
    # ignorenulls) would skip past it to an older value).
    carried = F.last(
        F.when(
            F.col("value").isNull() | (F.col("value") != UNCHANGED_SENTINEL),
            F.struct(F.col("value").alias("v")),
        ),
        ignorenulls=True,
    ).over(wc)
    resolved = cells.withColumn(
        "__resolved",
        F.when(carried.isNull(), F.col("value")).otherwise(carried["v"]),
    )
    maps = resolved.groupBy(key_col, "lsn").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("column", "__resolved")))
        ).alias("__values_resolved")
    )
    return versions.join(maps, [key_col, "lsn"], "left").withColumn(
        "new_values", F.coalesce(F.col("__values_resolved"), F.col("new_values"))
    )


def scd2_history(
    events: DataFrame, key_col: str = "key", resolve_sentinels: bool = True
) -> DataFrame:
    """Build type-2 history: one row per (key, version).

    Output: ``key, version, operation, values, valid_from, valid_to,
    is_current`` — ``valid_to`` null for open versions; DELETE events
    emit no version but close the previous one; ``is_current`` marks the
    last version of a key not superseded or deleted.
    """
    w = Window.partitionBy(key_col).orderBy("lsn")
    gen = F.sum(
        F.when(F.col("operation") == OP_DELETE, F.lit(1)).otherwise(F.lit(0))
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_next = (
        events.withColumn("__gen", gen)
        .withColumn("__next_ts", F.lead("ts").over(w))
        .withColumn("__next_op", F.lead("operation").over(w))
    )
    versions = with_next.filter(F.col("operation") != OP_DELETE)
    if resolve_sentinels:
        versions = _resolve_sentinels(versions, key_col)
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

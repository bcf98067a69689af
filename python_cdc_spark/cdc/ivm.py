"""Incremental view maintenance: group aggregates from a change feed.

``apply_changes`` materializes current state; an analytics consumer
usually wants an AGGREGATE of that state (counts / sums per group). At
100 TB the wrong plan is state-recompute-then-aggregate every refresh;
the right plan is the classic IVM algebra — turn every change event
into signed deltas against the maintained aggregate:

- a non-delete event contributes ``+new_image``, and ``-previous_image``
  if the key was already live (an upsert replaces);
- a DELETE contributes ``-last_live_image`` of the generation it closes
  (a generation = the span between delete boundaries; deleting a dead
  key contributes nothing);
- the maintained aggregate is the signed sum, dropping groups whose
  support count nets to zero.

Deltas telescope per key (+r1, -r1+r2, … = +r_last), so the signed sum
equals the aggregate of the final state exactly — the registry query's
DuckDB oracle checks precisely that equality (incremental plan vs full
recompute). Summation routes through fixed-scale decimals
(queries/helpers.py) so the cancellation is exact, not
floating-point-approximate.

Cost shape: two windows over (key) — generation numbering and the
previous-image lag — plus one small join for delete retractions and one
final aggregate. Everything partitions by key; no state table is read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from python_cdc_spark.queries.helpers import dec_sum


def signed_state_deltas(
    state_before: DataFrame,
    state_after: DataFrame,
    touched_keys: DataFrame,
    key_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """State-differencing form of the signed-delta algebra: given the
    maintained state BEFORE and AFTER applying a change batch and the
    set of keys the batch touched, return ``(plus, minus)`` row-image
    deltas — ``minus`` = the touched keys' pre-batch rows (retracted),
    ``plus`` = their post-batch rows (asserted). Inserts contribute only
    a plus row, deletes only a minus row, updates both; TOAST
    carry-forward and per-column latest-wins are already folded into the
    states by ``apply_changes``, so the deltas inherit them for free.

    This is the feed for ``plans/rollup.RollupCatalog.refresh_cdc``:
    ``old_cube ∪ agg(plus) ∪ -agg(minus)`` equals a rebuild over
    ``state_after`` exactly (sum/count), and ``plus ∪ minus`` names the
    affected groups for the non-decomposable measures. Cost shape: two
    semi-joins on the key — ``touched_keys`` is batch-sized, so AQE
    broadcasts it and neither state ever shuffles."""
    touched = touched_keys.select(*key_cols).distinct()
    minus = state_before.join(touched, key_cols, "left_semi")
    plus = state_after.join(touched, key_cols, "left_semi")
    return plus, minus


def incremental_group_aggregate(
    feed: DataFrame,
    key: str,
    lsn: str,
    op: str,
    group_col: Column | str,
    value_col: Column | str,
) -> DataFrame:
    """Maintain ``SELECT group, COUNT(*), SUM(value) FROM state GROUP BY
    group`` from the raw feed via signed deltas.

    ``group_col``/``value_col`` are expressions over a feed row yielding
    the new row image's group / measure (non-null on every non-delete
    event — e.g. ``new_values['event_type']`` for a map-image feed).
    Returns ``(grp, n_rows, sum_value)`` for groups with live support.
    """
    group_col = F.col(group_col) if isinstance(group_col, str) else group_col
    value_col = F.col(value_col) if isinstance(value_col, str) else value_col
    is_del = F.col(op) == "DELETE"
    wgen = (
        Window.partitionBy(key)
        .orderBy(lsn)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = feed.withColumn("__gen", F.sum(is_del.cast("int")).over(wgen))

    vers = f.filter(~is_del).select(
        F.col(key).alias("__k"),
        F.col(lsn).alias("__lsn"),
        F.col("__gen"),
        group_col.alias("grp"),
        value_col.cast("double").alias("val"),
    )
    wk = Window.partitionBy("__k", "__gen").orderBy("__lsn")
    with_prev = vers.select(
        "grp",
        "val",
        F.lag("grp").over(wk).alias("prev_grp"),
        F.lag("val").over(wk).alias("prev_val"),
    )

    plus = with_prev.select(
        "grp", F.col("val").alias("delta_val"), F.lit(1).alias("delta_n")
    )
    minus_upserts = with_prev.filter(F.col("prev_grp").isNotNull()).select(
        F.col("prev_grp").alias("grp"),
        (-F.col("prev_val")).alias("delta_val"),
        F.lit(-1).alias("delta_n"),
    )
    # a DELETE with __gen = g closes generation g-1; retract that
    # generation's last live image (if the generation had one)
    dels = f.filter(is_del).select(
        F.col(key).alias("__k"), (F.col("__gen") - 1).alias("__gen")
    )
    last_live = vers.groupBy("__k", "__gen").agg(
        F.max_by("grp", "__lsn").alias("grp"),
        F.max_by("val", "__lsn").alias("val"),
    )
    minus_deletes = dels.join(last_live, ["__k", "__gen"]).select(
        "grp", (-F.col("val")).alias("delta_val"), F.lit(-1).alias("delta_n")
    )

    deltas = plus.unionByName(minus_upserts).unionByName(minus_deletes)
    return (
        deltas.groupBy("grp")
        .agg(
            F.sum("delta_n").alias("n_rows"),
            dec_sum(F.col("delta_val"), "sum_value"),
        )
        .filter(F.col("n_rows") > 0)
    )

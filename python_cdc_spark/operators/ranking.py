"""Distributed exact global ranking (scale-safe NTILE / row_number).

A bare ``Window.orderBy(...)`` with no ``partitionBy`` funnels every row
through ONE task — fine for output-scale inputs, fatal when the ranked
table is itself large (e.g. per-customer aggregates at 100 TB are
billions of rows). The classic fix is two-phase:

1. Range-bucket rows on the sort key using approximate quantile
   boundaries (one ``approxQuantile`` pass; boundaries are broadcast as
   a literal array). Bucket assignment is monotone in the sort key, so
   buckets partition the total order into contiguous runs.
2. Count rows per bucket (an O(num_buckets) collect — metadata-scale,
   like the k-row centroid collects in operators/similarity.py), turn
   the counts into cumulative offsets, and compute the exact global
   row number as ``row_number() OVER (PARTITION BY bucket ORDER BY ...)
   + offset[bucket]``.

The approximation only affects load balance, never the result: whatever
boundaries the sketch picks, within-bucket row_number plus the exact
offset of everything below reproduces the exact global rank. NTILE then
follows from the SQL-standard formula (first ``n % k`` tiles get
``n/k + 1`` rows), so the output is bit-identical to a single-partition
``ntile(k) OVER (ORDER BY ...)`` — which is exactly what the DuckDB
oracle twin runs.

Ties: callers must pass tiebreak columns making the total order unique
(the registry determinism convention); rows equal on the sort key always
land in the same bucket, so tiebreaks never cross bucket boundaries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _bucket_expr(skey: str, boundaries: list[float]):
    """Monotone bucket id = #boundaries strictly below the sort key."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b < F.col(skey)))


def with_global_row_number(
    df: DataFrame,
    key_col: str,
    *,
    ascending: bool = True,
    tiebreak: Sequence[str] = (),
    out: str = "rn",
    num_buckets: int = 32,
) -> tuple[DataFrame, int]:
    """Add an exact 1-based global row number ordered by
    ``(key_col [DESC], *tiebreak ASC)`` without a single-partition
    window. Returns ``(df_with_rn, total_rows)``.

    ``key_col`` must be numeric (it feeds approxQuantile); ``tiebreak``
    must make the order total. Triggers two small jobs at plan-build
    time (quantile sketch + per-bucket counts), like the k-means fits
    elsewhere in this package.
    """
    skey = f"__{out}_skey"
    bkt = f"__{out}_bkt"
    off = f"__{out}_off"
    keyed = df.withColumn(
        skey,
        F.col(key_col).cast("double")
        if ascending
        else -F.col(key_col).cast("double"),
    )
    probs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = sorted(set(keyed.approxQuantile(skey, probs, 0.001))) if probs else []
    tagged = keyed.withColumn(bkt, _bucket_expr(skey, boundaries))
    counts = {r[0]: r[1] for r in tagged.groupBy(bkt).count().collect()}
    total = int(sum(counts.values()))
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((int(b), acc))
        acc += int(counts[b])
    spark = df.sparkSession
    # VALUES keeps the tiny offset table JVM-side (a small
    # createDataFrame costs a 32-task pickled-RDD stage; see NOTES_r4).
    values = ", ".join(f"({b}, {o})" for b, o in offsets) or "(0, 0)"
    off_df = spark.sql(f"SELECT * FROM VALUES {values} AS t({bkt}, {off})")
    w = Window.partitionBy(bkt).orderBy(
        F.col(skey).asc(), *[F.col(t).asc() for t in tiebreak]
    )
    out_df = (
        tagged.join(broadcast(off_df), bkt)
        .withColumn(out, (F.row_number().over(w) + F.col(off)).cast("long"))
        .drop(skey, bkt, off)
    )
    return out_df, total


def ntile_from_row_number(rn_col: str, total: int, k: int):
    """SQL-standard NTILE(k) from an exact 1-based row number over
    ``total`` rows: the first ``total % k`` tiles hold ``total//k + 1``
    rows, the rest ``total//k`` — the same distribution Spark and DuckDB
    implement. Integer DIV keeps it exact at any scale."""
    q, r = divmod(int(total), int(k))
    if q == 0:
        return F.col(rn_col).cast("int")
    cut = r * (q + 1)
    return F.expr(
        f"CAST(CASE WHEN {rn_col} <= {cut} "
        f"THEN ({rn_col} + {q}) DIV {q + 1} "
        f"ELSE {r} + ({rn_col} - {cut} + {q - 1}) DIV {q} END AS INT)"
    )


def with_distributed_ntile(
    df: DataFrame,
    k: int,
    key_col: str,
    *,
    ascending: bool = True,
    tiebreak: Sequence[str] = (),
    out: str = "tile",
    num_buckets: int = 32,
) -> DataFrame:
    """Exact NTILE(k) over a global order, computed with bucket-parallel
    windows instead of one single-partition sort. Bit-identical to
    ``ntile(k) OVER (ORDER BY key [DESC], *tiebreak)``."""
    rn = f"__{out}_rn"
    ranked, total = with_global_row_number(
        df,
        key_col,
        ascending=ascending,
        tiebreak=tiebreak,
        out=rn,
        num_buckets=num_buckets,
    )
    return ranked.withColumn(out, ntile_from_row_number(rn, total, k)).drop(rn)


def with_global_prefix_sum_long(
    df: DataFrame,
    key_col: str,
    val_col: str,
    *,
    ascending: bool = True,
    tiebreak: Sequence[str] = (),
    out: str = "running_sum",
    num_buckets: int = 32,
) -> tuple[DataFrame, int]:
    """Exact global running total of a LONG column over
    ``(key_col [DESC], *tiebreak ASC)`` order — the cumulative-share /
    Pareto primitive — without a single-partition window. Same
    range-bucket construction as ``with_global_row_number``; the
    per-bucket collect carries bucket SUMS instead of counts, so the
    cumulative offset of everything in lower buckets is exact integer
    arithmetic (callers encode money as integer cents — exact,
    order-independent, immune to decimal precision-capping rules).
    Returns ``(df_with_running_sum, grand_total)``."""
    skey = f"__{out}_skey"
    bkt = f"__{out}_bkt"
    off = f"__{out}_off"
    keyed = df.withColumn(
        skey,
        F.col(key_col).cast("double")
        if ascending
        else -F.col(key_col).cast("double"),
    )
    probs = [i / num_buckets for i in range(1, num_buckets)]
    boundaries = sorted(set(keyed.approxQuantile(skey, probs, 0.001))) if probs else []
    tagged = keyed.withColumn(bkt, _bucket_expr(skey, boundaries))
    sums = {
        r[0]: int(r[1])
        for r in tagged.groupBy(bkt).agg(F.sum(F.col(val_col)).alias("s")).collect()
    }
    total = sum(sums.values())
    offsets, acc = [], 0
    for b in sorted(sums):
        offsets.append((int(b), acc))
        acc += sums[b]
    spark = df.sparkSession
    values = ", ".join(f"({b}, {o}L)" for b, o in offsets) or "(0, 0L)"
    off_df = spark.sql(f"SELECT * FROM VALUES {values} AS t({bkt}, {off})")
    w = (
        Window.partitionBy(bkt)
        .orderBy(F.col(skey).asc(), *[F.col(t).asc() for t in tiebreak])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_df = (
        tagged.join(broadcast(off_df), bkt)
        .withColumn(out, (F.sum(F.col(val_col)).over(w) + F.col(off)).cast("long"))
        .drop(skey, bkt, off)
    )
    return out_df, int(total)

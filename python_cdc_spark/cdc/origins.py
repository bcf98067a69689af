"""Replication-origin tracking (pgoutput ``O`` frames) and loop filtering.

PostgreSQL emits an Origin frame inside a transaction — between BEGIN
and the first DML — when that transaction was itself replayed from
another node (replication origins; cf. the ``origin`` publication /
subscription parameter, values ``any`` | ``none``). Subscribers in
bidirectional topologies filter origin-carrying transactions to break
replication loops. The reference's dispatch falls through on ``O``
(``pg_output_parser.py:32-39``, no loop filtering); this module
implements the subscriber semantics on top of the control-frame codec.

Semantics: the origin of a DML event is the name carried by the most
recent marker frame at-or-before the event's LSN, where BEGIN resets
the origin to NULL (local) and ``O`` sets it. That is a global as-of
over the LSN axis.

Scale shape (the part that matters at 100 TB): txn markers are
O(transactions) while events are O(rows), and there is no natural
partition key for a global ordered scan. We use the bucket-parallel
prefix-carry pattern (same as ``operators/ranking.py``): LSNs hash to
range buckets, a within-bucket window resolves events whose governing
marker is in their own bucket, and the cross-bucket carry is computed
from per-bucket LAST-marker aggregates — O(non-empty buckets) rows
collected to the driver, forward-filled, and broadcast back. No global
sort, no single-partition window over row-scale data.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def txn_markers(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """``(lsn, origin)`` for every BEGIN (origin NULL — local) and
    Origin frame (origin = its name). All-JVM: the name is the
    trailing cstring of the ``O`` frame (tag byte + Int64 commit LSN +
    name + NUL), sliced with binary substring/decode — no UDF."""
    tag = F.substring(frame_col, 1, 1)
    begins = frames.filter(tag == F.lit("B")).select(
        "lsn", F.lit(None).cast("string").alias("origin")
    )
    name = F.decode(
        F.expr(f"substring({frame_col}, 10, length({frame_col}) - 10)"),
        "UTF-8",
    )
    origins = frames.filter(tag == F.lit("O")).select(
        "lsn", name.alias("origin")
    )
    return begins.unionByName(origins)


def annotate_origins(
    spark: SparkSession,
    events: DataFrame,
    frames: DataFrame,
    frame_col: str = "frame",
    bucket_width: int = 1 << 16,
    initial_origin: str | None = None,
) -> DataFrame:
    """Add an ``origin`` column to decoded DML events: the replaying
    node's name for origin-carrying transactions, NULL for local ones.

    ``initial_origin`` seeds the carry for events that precede every
    marker in ``frames`` — the streaming resume case, where the
    governing marker arrived in an earlier micro-batch.

    The occupied-bucket probe runs against ``frames`` (tag-sliced to the
    event-bearing messages I/U/D/T), not against ``events``: this
    function's contract is that ``events`` was decoded FROM ``frames``
    (decode only ever drops frames), so the frame-derived bucket set is
    a superset of the events' — and a superset is exact here, because a
    bucket's carry depends only on the markers BELOW it (extra carry
    rows join no event row). Probing the binary frames avoids running
    the whole Arrow decode once per invocation just to learn which
    buckets exist (the r14 composite profile measured the decode pass
    twice per run for exactly this reason).

    The probe and the per-bucket last-marker aggregate (the two scalar
    inputs to the cross-bucket carry) are computed in ONE aggregate over
    ``frames`` — one Spark job and one scan instead of two of each; both
    results are O(non-empty buckets), driver-safe by the module's scale
    contract.
    """
    tag = F.substring(frame_col, 1, 1)
    bucket = (F.col("lsn") / F.lit(int(bucket_width))).cast("bigint")
    # same name slice as txn_markers, gated to O frames (B resets to NULL)
    name = F.decode(
        F.expr(f"substring({frame_col}, 10, length({frame_col}) - 10)"),
        "UTF-8",
    )
    probe = (
        frames.groupBy(bucket.alias("__b"))
        .agg(
            F.max(tag.isin("I", "U", "D", "T").cast("int")).alias("__has_ev"),
            F.max_by(
                F.struct(F.when(tag == "O", name).alias("origin")),
                F.when(tag.isin("B", "O"), F.col("lsn")),
            ).alias("__last"),
        )
        .collect()
    )
    event_buckets = [r["__b"] for r in probe if r["__has_ev"] == 1]
    marker_lasts = sorted(
        (r["__b"], r["__last"]["origin"]) for r in probe if r["__last"] is not None
    )
    return annotate_origins_from_markers(
        spark,
        events,
        txn_markers(frames, frame_col),
        bucket_width=bucket_width,
        initial_origin=initial_origin,
        event_buckets=event_buckets,
        marker_lasts=marker_lasts,
    )


def annotate_origins_from_markers(
    spark: SparkSession,
    events: DataFrame,
    markers: DataFrame,
    bucket_width: int = 1 << 16,
    initial_origin: str | None = None,
    event_buckets: list[int] | None = None,
    marker_lasts: list[tuple[int, str | None]] | None = None,
) -> DataFrame:
    """Core of :func:`annotate_origins` over pre-decoded txn markers
    ``(lsn, origin)`` — origin NULL for BEGIN (reset to local), a name
    for Origin frames. Takes markers directly so feeds that never pass
    through the binary codec (tests, derived feeds) use the same
    resolution machinery.

    ``event_buckets`` lets a caller that already knows which buckets its
    events occupy (or any SUPERSET — extra buckets only add carry rows
    that join nothing) skip the distinct-buckets probe over ``events``;
    ``marker_lasts`` likewise skips the per-bucket last-marker collect
    (sorted ``(bucket, origin)``, one row per marker-bearing bucket).
    The defaults derive both from the DataFrames as before."""
    bucket = (F.col("lsn") / F.lit(int(bucket_width))).cast("bigint")

    if marker_lasts is None:
        # the marker frame then feeds two consumers — the within-bucket
        # union and the per-bucket last-marker aggregate below — so
        # materialize it once (lazy: the aggregate's collect is the
        # first action and pins it). When marker_lasts is supplied the
        # union is the only consumer and the checkpoint would be pure
        # overhead.
        markers = markers.localCheckpoint(eager=False)

    # Within-bucket resolution: markers sort before events at the same
    # LSN (__is_ev ascending) so a marker is visible to a same-LSN DML.
    mk = markers.select(
        "lsn",
        F.lit(0).alias("__is_ev"),
        F.struct(F.col("origin")).alias("__m"),
    ).withColumn("__b", bucket)
    ev = (
        events.withColumn("__b", bucket)
        .withColumn("__is_ev", F.lit(1))
        .withColumn("__m", F.lit(None).cast("struct<origin:string>"))
    )
    u = ev.unionByName(mk, allowMissingColumns=True)
    w = (
        Window.partitionBy("__b")
        .orderBy("lsn", "__is_ev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__wm", F.last("__m", ignorenulls=True).over(w))

    # Cross-bucket carry: last marker per marker-bucket (≤ 1 row per
    # bucket — metadata scale), forward-filled on the driver across the
    # distinct buckets events actually occupy, broadcast-joined back.
    if marker_lasts is None:
        marker_lasts = sorted(
            (
                (r["__b"], r["__last"]["origin"])
                for r in markers.groupBy(bucket.alias("__b"))
                .agg(F.max_by(F.struct("origin"), "lsn").alias("__last"))
                .collect()
            ),
        )
    event_buckets = sorted(
        r["__b"] for r in events.select(bucket.alias("__b")).distinct().collect()
    ) if event_buckets is None else sorted(event_buckets)
    carry_rows = []
    carry = initial_origin
    i = 0
    for b in event_buckets:
        while i < len(marker_lasts) and marker_lasts[i][0] < b:
            carry = marker_lasts[i][1]
            i += 1
        if carry is not None:
            carry_rows.append((b, carry))
    if carry_rows:
        from python_cdc_spark.functions.literals import literal_df

        # JVM-side literal (not createDataFrame): this join runs once
        # per apply batch, and a pickled-RDD side would add a
        # Python-worker job to every broadcast materialization
        carry_df = literal_df(
            spark, carry_rows, [("__b", "bigint"), ("__carry", "string")]
        )
        u = u.join(F.broadcast(carry_df), "__b", "left")
    else:
        u = u.withColumn("__carry", F.lit(None).cast("string"))

    resolved = F.when(
        F.col("__wm").isNotNull(), F.col("__wm")["origin"]
    ).otherwise(F.col("__carry"))
    return (
        u.filter(F.col("__is_ev") == 1)
        .withColumn("origin", resolved)
        .drop("__b", "__is_ev", "__m", "__wm", "__carry")
    )


def filter_by_origin(
    events: DataFrame, origin: str | Iterable[str] = "any"
) -> DataFrame:
    """Apply the subscription's ``origin`` parameter to annotated
    events: ``"any"`` keeps everything, ``"none"`` keeps only locally
    originated transactions (origin NULL — the loop-breaking setting),
    and an iterable of names keeps local txns plus those origins (an
    extension PostgreSQL spells as per-origin filtering in custom
    output plugins)."""
    if origin == "any":
        return events
    if origin == "none":
        return events.filter(F.col("origin").isNull())
    # a bare origin name is a one-element allow-list — without this,
    # list("region_b") would silently become a list of CHARACTERS and
    # filter out nearly everything
    allowed = [origin] if isinstance(origin, str) else list(origin)
    return events.filter(
        F.col("origin").isNull() | F.col("origin").isin(allowed)
    )


def last_marker(frames: DataFrame, frame_col: str = "frame"):
    """The (lsn, origin) of the feed's final marker, or None — the
    carry state a streaming consumer persists across micro-batches."""
    row = (
        txn_markers(frames, frame_col)
        .agg(F.max_by(F.struct("lsn", "origin"), "lsn").alias("m"))
        .first()
    )
    if row is None or row["m"] is None:
        return None
    return {"lsn": row["m"]["lsn"], "origin": row["m"]["origin"]}

#!/usr/bin/env python
"""Streaming gates under SUSTAINED feed at three scales (VERDICT r9 #5).

The batch scale trend (tools/bench_scale_trend.py) times the registered
queries' one-shot plans; this tool times the STREAMING maintenance gates
the way production runs them — a multi-micro-batch availableNow drain of
a file feed through foreachBatch state maintenance:

- ``apply``       StreamingApplyChanges: per-batch fold into the
                  bucket-partitioned keyed state store (O(batch +
                  touched_state) claim).
- ``cdc_rollup``  StreamingCdcRollupMaintenance: the flagship two-half
                  integration — every batch folds signed row-image
                  deltas into a materialized cube (algebraic sum/count
                  measures here, so the per-batch claim is
                  O(batch + cube), no state scan).
- ``scd2``        StreamingSCD2: full history maintenance — the honest
                  worst case, because the feed's keys are uniform so
                  EVERY batch touches every bucket and rewrites the
                  whole (growing) history. Included precisely because
                  it is the gate where a super-linear stage would hide.

Feed: ``events_as_cdc_feed`` over each scale's events table (1M / 10M /
100M change events), written once per (gate, scale) as ``N_FILES``
lsn-range-ordered parquet files and drained with
``maxFilesPerTrigger = N_FILES / N_BATCHES`` — so every run is the same
8-micro-batch sustained shape and only the data volume changes. Fresh
session per (gate, scale): exponents attribute to the gate, not its
session neighbors (same isolation rationale as the scale trend's
--isolate).

The scaling claim under test: events/s throughput should be flat-to-
RISING with scale (per-event cost amortizes fixed micro-batch overhead),
except scd2 where history ~ corpus makes per-batch rewrite volume grow
— its exponent is expected ~1 and the receipt says so rather than
hiding the row.

Usage: python tools/bench_stream_sustained.py [--only=apply,scd2]
       [--scales=sf0.1,sf1] [sf10_dir]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 24
N_BATCHES = 8
GATES = ("apply", "cdc_rollup", "scd2", "wire")


def _fresh_spark():
    from pyspark.sql import SparkSession

    from python_cdc_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app_name="bench_stream_sustained")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _write_feed(spark, sf_dir: str, feed_dir: str) -> int:
    """Materialize the change feed as N_FILES lsn-range-ordered parquet
    files (micro-batches then arrive in lsn order, the shape a real
    replication stream delivers — SCD2's history fold depends on it)."""
    from python_cdc_spark.cdc.feed import events_as_cdc_feed

    feed = events_as_cdc_feed(spark, sf_dir)
    (
        feed.repartitionByRange(N_FILES, "lsn")
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    _pin_mtime_order(feed_dir)
    return spark.read.parquet(feed_dir).count()


def _pin_mtime_order(feed_dir: str) -> None:
    """The file source orders batches by MODIFICATION TIME, and a
    parallel write finishes its part files in arbitrary order — pin
    mtimes to path (= lsn-range) order so micro-batches actually arrive
    in the lsn order the maintenance gates' claims assume."""
    import glob

    for i, f in enumerate(sorted(glob.glob(os.path.join(feed_dir, "part-*")))):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))


def _feed_stream(spark, feed_dir: str):
    from pyspark.sql import types as T

    from python_cdc_spark.schemas import CDC_EVENT_SCHEMA

    schema = T.StructType(
        list(CDC_EVENT_SCHEMA.fields) + [T.StructField("key", T.StringType(), True)]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, N_FILES // N_BATCHES))
        .parquet(feed_dir)
    )


def _write_wire_feed(spark, sf_dir: str, feed_dir: str) -> int:
    """RAW pgoutput wire frames from the events table (the r10 verdict
    #8 decode-under-feed shape): distributed mapInPandas encode of one
    I/U/D frame per event, an initial R-frame pair, and a MID-STREAM
    R-frame (rename amount → amount_usd at the median lsn) so every run
    exercises live registry refresh inside the drain. Written as
    N_FILES lsn-range-ordered files like the decoded feed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from python_cdc_spark.cdc.pgoutput import (
        encode_delete,
        encode_insert,
        encode_relation,
        encode_update,
    )
    from python_cdc_spark.io import table

    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    head = ev.agg(F.max("event_id"), F.min("ts")).first()
    max_eid, ts0 = int(head[0]), head[1]
    s_lsn = 8 * (max_eid // 2)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            frames, lsns = [], []
            for eid, uid, et, v in zip(
                pdf["event_id"], pdf["user_id"], pdf["event_type"], pdf["value"]
            ):
                eid = int(eid)
                relid = 1 if eid % 2 == 0 else 2
                kid = str(int(uid))
                val = "0.0" if pd.isna(v) else repr(float(v))
                if et == "signup":
                    f = encode_insert(relid, [kid, val])
                elif et == "error":
                    f = encode_delete(relid, [kid, None], key_only=True)
                else:
                    f = encode_update(relid, [kid, val])
                frames.append(bytearray(f))
                lsns.append(8 * eid + 4)
            yield pd.DataFrame(
                {"lsn": pd.Series(lsns, dtype="int64"), "ts": pdf["ts"], "frame": frames}
            )

    dml = ev.mapInPandas(enc, "lsn bigint, ts timestamp, frame binary")
    ctl = spark.createDataFrame(
        [
            (0, ts0, bytearray(encode_relation(1, "public", "users", ["id", "amount"]))),
            (0, ts0, bytearray(encode_relation(2, "public", "orders", ["id", "amount"]))),
            (s_lsn, ts0, bytearray(encode_relation(1, "public", "users", ["id", "amount_usd"]))),
        ],
        "lsn bigint, ts timestamp, frame binary",
    )
    (
        dml.unionByName(ctl)
        .repartitionByRange(N_FILES, "lsn")
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    _pin_mtime_order(feed_dir)
    return spark.read.parquet(feed_dir).count()


def _run_gate(spark, gate: str, feed_dir: str, work: str) -> dict:
    """Drain the feed through one maintenance gate; return timings."""
    stream = _feed_stream(spark, feed_dir)
    ckpt = os.path.join(work, "ckpt")
    t0 = time.perf_counter()
    if gate == "apply":
        from python_cdc_spark.streaming.apply_stream import StreamingApplyChanges

        g = StreamingApplyChanges(spark, os.path.join(work, "state"), "key", n_buckets=64)
        q = g.start(stream, ckpt, available_now=True)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        out_rows = g.current_state().count()
    elif gate == "scd2":
        from python_cdc_spark.streaming.scd2_stream import StreamingScd2

        g = StreamingScd2(spark, os.path.join(work, "state"), "key", n_buckets=64)
        q = g.start(stream, ckpt, available_now=True)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        out_rows = g.history().count()
    elif gate == "wire":
        from pyspark.sql import functions as F

        from python_cdc_spark.streaming import StreamingWireApplyChanges

        wire_stream = (
            spark.readStream.schema("lsn bigint, ts timestamp, frame binary")
            .option("maxFilesPerTrigger", max(1, N_FILES // N_BATCHES))
            .parquet(feed_dir)
        )
        g = StreamingWireApplyChanges(
            spark,
            os.path.join(work, "state"),
            key_extractor=lambda ev: ev.withColumn(
                "key",
                F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"]),
            ),
            n_buckets=64,
        )
        q = g.start_wire(wire_stream, ckpt, available_now=True)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        out_rows = g.current_state().count()
        # the mid-stream DDL must have refreshed the live registry
        assert g.registry[1]["columns"] == ["id", "amount_usd"], "DDL refresh missed"
    else:  # cdc_rollup
        from python_cdc_spark.streaming.rollup_stream import StreamingCdcRollupMaintenance

        g = StreamingCdcRollupMaintenance(
            spark,
            os.path.join(work, "state"),
            os.path.join(work, "cube"),
            "events_cube",
            dims={"event_type": "event_type"},
            measures={"n": ("count", "1"), "total": ("sum", "value")},
            typed_columns={"event_type": "string", "value": "double"},
            n_buckets=64,
        )
        g.init_cube(fingerprint="bench")
        q = g.start(stream, ckpt, available_now=True)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        out_rows = g.rewrite(["event_type"], ["n", "total"]).count()
    batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    return {"sec": round(wall, 3), "batches": batches, "out_rows": out_rows}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf10 = argv[0] if argv else os.path.join(repo, ".sf10")
    scales = [
        # sf0.001/sf0.01 are smoke-only (request via --scales=)
        ("sf0.001", "/root/testdata/sf0.001", 0.01),
        ("sf0.01", "/root/testdata/sf0.01", 0.1),
        ("sf0.1", "/root/testdata/sf0.1", 1.0),
        ("sf1", os.path.join(repo, ".sf1"), 10.0),
        ("sf10", sf10, 100.0),
    ]
    only = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")]
    gates = [g for g in GATES if not only or g in only[0].split(",")]
    want_scales = [
        a.split("=", 1)[1].split(",") for a in sys.argv[1:] if a.startswith("--scales=")
    ]
    if want_scales:
        scales = [s for s in scales if s[0] in want_scales[0]]
    else:
        scales = [s for s in scales if s[0] in ("sf0.1", "sf1", "sf10")]
    scales = [s for s in scales if os.path.isdir(s[1])]

    out: dict = {
        "metric": "streaming_sustained_feed_trend",
        "unit": "sec",
        "n_files": N_FILES,
        "n_batches": N_BATCHES,
        "scales": {k: {"dir": d, "x": x} for k, d, x in scales},
        "per_gate": {g: {} for g in gates},
    }
    events: dict[str, int] = {}
    for label, sf_dir, _x in scales:
        for gate in gates:
            spark = _fresh_spark()
            work = tempfile.mkdtemp(prefix=f"stream_sust_{gate}_{label}_")
            try:
                feed_dir = os.path.join(work, "feed")
                if gate == "wire":
                    n = _write_wire_feed(spark, sf_dir, feed_dir)
                else:
                    n = _write_feed(spark, sf_dir, feed_dir)
                events[label] = n
                row = _run_gate(spark, gate, feed_dir, work)
                row["events"] = n
                row["events_per_sec"] = round(n / row["sec"], 1)
                out["per_gate"][gate][label] = row
                print(
                    f"# {label} {gate}: {row['sec']}s, {n} events, "
                    f"{row['events_per_sec']} ev/s, {row['batches']} batches, "
                    f"{row['out_rows']} out rows",
                    file=sys.stderr,
                    flush=True,
                )
            finally:
                shutil.rmtree(work, ignore_errors=True)
    for gate in gates:
        t = out["per_gate"][gate]
        for lo, hi, key in (("sf0.1", "sf1", "exp_0.1_to_1"), ("sf1", "sf10", "exp_1_to_10")):
            if t.get(lo) and t.get(hi):
                t[key] = round(math.log(t[hi]["sec"] / t[lo]["sec"]) / math.log(10), 3)
    out["events_per_scale"] = events
    print(json.dumps(out))


if __name__ == "__main__":
    main()

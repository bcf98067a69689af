#!/usr/bin/env python
"""Streaming end-to-end latency under sustained load (VERDICT r4 #6).

Composes the live pieces the way tools/live_capture.py does, but with a
synthetic generator standing in for the PostgreSQL socket so the run is
self-contained: a producer thread writes (lsn, ts=now, frame) parquet
batches into a wire directory at a sustained event rate — the exact
file-per-batch shape ``LogicalReplicationClient.dump_parquet`` emits —
while ``StreamingWireApplyChanges`` tails the directory continuously
(processingTime trigger) and records capture→applied lag per micro-batch.
The HealthServer serves the live numbers on ``/metrics`` and this tool
samples them over the run, then repeats at double the rate to show how
lag responds to load (micro-batch fold cost, not queue collapse).

Prints ONE JSON line:
  {"metric": "streaming_capture_to_apply_latency", "phases": [
     {"rate_eps": R, "duration_sec": D, "events": N,
      "lag_p50_sec": ..., "lag_max_sec": ..., "batches": B}, ...]}

Usage: python tools/bench_latency.py [--rate 200] [--seconds 30]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _producer(
    wire_dir: str,
    rate_eps: float,
    seconds: float,
    stop: threading.Event,
    counter: dict,
) -> None:
    """Write one parquet batch file per ~0.5s at the target event rate,
    timestamps = wall clock at encode time (the capture timestamp)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from python_cdc_spark.cdc.pgoutput import encode_insert, encode_relation

    schema = pa.schema(
        [
            ("lsn", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("frame", pa.binary()),
        ]
    )
    relid = 9
    lsn = 1
    batch_no = 0
    # relation frame first (pgoutput contract: R precedes its rows)
    first_frames = [encode_relation(relid, "public", "users", ["id", "name"])]
    deadline = time.monotonic() + seconds
    per_batch = max(1, int(rate_eps * 0.5))
    while time.monotonic() < deadline and not stop.is_set():
        t0 = time.monotonic()
        frames = list(first_frames)
        first_frames = []
        for _ in range(per_batch):
            frames.append(encode_insert(relid, [str(lsn % 1000), f"user{lsn}"]))
            lsn += 1
        now = dt.datetime.now(dt.timezone.utc)
        tbl = pa.table(
            {
                "lsn": list(range(lsn - len(frames), lsn)),
                "ts": [now] * len(frames),
                "frame": frames,
            },
            schema=schema,
        )
        final = os.path.join(wire_dir, f"batch-{batch_no:06d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)  # files must appear atomically
        counter["events"] = counter.get("events", 0) + len(frames)
        batch_no += 1
        sleep = 0.5 - (time.monotonic() - t0)
        if sleep > 0:
            stop.wait(sleep)


def _run_phase(spark, rate_eps: float, seconds: float) -> dict:
    from pyspark.sql import functions as F

    from python_cdc_spark.cdc.monitor import HealthServer
    from python_cdc_spark.streaming import StreamingWireApplyChanges

    root = tempfile.mkdtemp(prefix="lat_bench_")
    wire = os.path.join(root, "wire")
    os.makedirs(wire)
    stop = threading.Event()
    counter: dict = {}
    prod = threading.Thread(
        target=_producer, args=(wire, rate_eps, seconds, stop, counter), daemon=True
    )
    prod.start()
    while not os.listdir(wire):
        time.sleep(0.05)

    stream = spark.readStream.schema(
        "lsn bigint, ts timestamp, frame binary"
    ).parquet(wire)
    applier = StreamingWireApplyChanges(
        spark,
        os.path.join(root, "state"),
        key_extractor=lambda ev: ev.withColumn(
            "key", F.coalesce(F.col("new_values")["id"], F.col("old_values")["id"])
        ),
    )
    q = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(processingTime="1 second")
        .foreachBatch(lambda df, bid: applier.merge_wire_batch(df, bid))
        .start()
    )
    samples = []
    try:
        with HealthServer(spark, q, extra_metrics=applier.latency_report) as hs:
            t_end = time.monotonic() + seconds + 5
            while time.monotonic() < t_end:
                time.sleep(2.0)
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{hs.port}/metrics", timeout=10
                ) as resp:
                    m = json.loads(resp.read())
                lat = m.get("apply_latency", {})
                if lat.get("batches_measured"):
                    samples.append(lat)
                    print(
                        f"# rate {rate_eps}: p50 "
                        f"{lat['capture_to_apply_sec_p50']}s max "
                        f"{lat['capture_to_apply_sec_max']}s "
                        f"({lat['batches_measured']} batches)",
                        file=sys.stderr,
                    )
    finally:
        stop.set()
        q.stop()
        q.awaitTermination(60)
        prod.join(timeout=10)
        shutil.rmtree(root, ignore_errors=True)
    final = samples[-1] if samples else {}
    first = samples[0] if samples else {}
    p50_first = first.get("capture_to_apply_sec_p50")
    p50_last = final.get("capture_to_apply_sec_p50")
    # saturated when: the live compounding-trend flag fired; the
    # windowed p50 climbed phase-long by more than startup jitter; the
    # ACHIEVED apply throughput fell measurably below the offered rate
    # (the signal the applier itself cannot see — it has no notion of
    # the offered rate); or batches grew so large the phase fit <= 3 of
    # them (each micro-batch >= 10 s behind a 1 s trigger: hopeless
    # backlog, and too few samples for the window statistics at all)
    applied = final.get("applied_eps_window")
    growing = (
        bool(final.get("saturated"))
        or (
            p50_first is not None
            and p50_last is not None
            and p50_last - p50_first > max(2.0, p50_first)
        )
        or (applied is not None and applied < 0.85 * rate_eps)
        or (final.get("batches_measured") or 0) <= 3
    )
    return {
        "rate_eps": rate_eps,
        "duration_sec": seconds,
        "events": counter.get("events", 0),
        "lag_p50_sec": p50_last,
        "lag_p95_sec": final.get("capture_to_apply_sec_p95"),
        "lag_max_sec": final.get("capture_to_apply_sec_max"),
        "applied_eps": final.get("applied_eps_window"),
        "lag_trend_sec_per_batch": final.get("lag_trend_sec_per_batch"),
        "batches": final.get("batches_measured"),
        "saturated": growing,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=200.0, help="events/sec")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument(
        "--sweep",
        action="store_true",
        help="double the rate until lag grows unbounded (the saturation "
        "knee, VERDICT r5 #6); reports max_sustainable_rate_eps",
    )
    args = ap.parse_args()

    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name="bench_latency")
    spark.sparkContext.setLogLevel("ERROR")
    phases = []
    if args.sweep:
        rate = args.rate
        max_ok = None
        while True:
            ph = _run_phase(spark, rate, args.seconds)
            phases.append(ph)
            if ph["saturated"]:
                break
            max_ok = rate
            if rate >= 1_000_000:  # generator ceiling safeguard
                break
            rate *= 2
        out = {
            "metric": "streaming_capture_to_apply_latency",
            "mode": "sweep",
            "max_sustainable_rate_eps": max_ok,
            "phases": phases,
        }
    else:
        phases = [
            _run_phase(spark, args.rate, args.seconds),
            _run_phase(spark, args.rate * 2, args.seconds),
        ]
        out = {
            "metric": "streaming_capture_to_apply_latency",
            "phases": phases,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

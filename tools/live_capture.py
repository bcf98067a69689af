#!/usr/bin/env python
"""Live CDC capture: the reference's ``cdc_consumer.py`` main, re-shaped.

Connects to a real PostgreSQL over the wire protocol (no driver
dependency — ``cdc/replication_client.py``), creates the slot if
missing, and streams pgoutput frames into ``(lsn, ts, frame)`` parquet
batches under ``--out``. A Spark Structured Streaming job tails that
directory (see ``--spark-apply``) and applies the changes into the
bucketed state store, with the HTTP health endpoint live while it runs
— capture, decode, apply, and health in one process, like the
reference wires its consumer, workers, and health server together.

Examples:
    # capture only (any Spark job can tail --out later)
    python tools/live_capture.py --host pg --db app --user cdc \
        --password s3cret --slot cdc_slot --publication cdc_publication \
        --out /data/wire

    # capture + streaming apply + health endpoint on $PORT
    python tools/live_capture.py ... --spark-apply /data/state
"""

from __future__ import annotations

import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=5432)
    ap.add_argument("--db", required=True)
    ap.add_argument("--user", required=True)
    ap.add_argument("--password", default=os.environ.get("PGPASSWORD"))
    ap.add_argument("--slot", default="cdc_slot")
    ap.add_argument("--publication", default="cdc_publication")
    ap.add_argument("--out", required=True, help="parquet frame-batch dir")
    ap.add_argument("--batch-rows", type=int, default=10_000)
    ap.add_argument("--max-seconds", type=float, default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument(
        "--spark-apply",
        metavar="STATE_DIR",
        default=None,
        help="also run the streaming decode+apply into this state dir, "
        "with the HTTP health endpoint on $PORT",
    )
    ap.add_argument("--key-column", default="id", help="primary-key column name")
    args = ap.parse_args()

    from python_cdc_spark.cdc.replication_client import LogicalReplicationClient

    client = LogicalReplicationClient(
        args.host, args.port, args.db, args.user, args.password
    )
    client.connect()
    ident = client.identify_system()
    print(f"# connected: system {ident['systemid']} at {ident['xlogpos']}", file=sys.stderr)
    client.create_slot(args.slot)
    client.start_replication(args.slot, publication=args.publication)

    stop = threading.Event()
    if args.spark_apply:
        t = threading.Thread(
            target=_spark_apply,
            args=(args.out, args.spark_apply, args.key_column, stop),
            daemon=True,
        )
        t.start()

    def on_batch(path: str, rows: int) -> None:
        print(f"# wrote {path} ({rows} frames, lsn {client.flushed_lsn})", file=sys.stderr)

    try:
        n = client.dump_parquet(
            args.out,
            batch_rows=args.batch_rows,
            max_frames=args.max_frames,
            max_seconds=args.max_seconds,
            on_batch=on_batch,
        )
        print(f"# capture done: {n} frames", file=sys.stderr)
    finally:
        stop.set()
        client.close()


def _spark_apply(wire_dir: str, state_dir: str, key_col: str, stop: threading.Event) -> None:
    import pyspark.sql.functions as F

    from python_cdc_spark.cdc.monitor import HealthServer
    from python_cdc_spark.session import get_spark
    from python_cdc_spark.streaming import StreamingWireApplyChanges

    spark = get_spark(app_name="live_capture_apply")
    os.makedirs(wire_dir, exist_ok=True)
    while not os.listdir(wire_dir) and not stop.is_set():
        stop.wait(0.5)
    stream = (
        spark.readStream.schema("lsn bigint, ts timestamp, frame binary")
        .parquet(wire_dir)
    )

    def extract_key(events):
        return events.withColumn(
            "key",
            F.coalesce(F.col("new_values")[key_col], F.col("old_values")[key_col]),
        )

    # wire applier: registry refreshes per micro-batch (mid-stream DDL)
    # and capture→applied latency is recorded per batch, served on
    # /metrics as apply_latency
    applier = StreamingWireApplyChanges(spark, state_dir, extract_key)
    q = applier.start_wire(stream, state_dir + "_ckpt")
    with HealthServer(spark, q, extra_metrics=applier.latency_report) as srv:
        print(f"# health endpoint on :{srv.port}", file=sys.stderr)
        while not stop.is_set():
            stop.wait(1.0)
        q.stop()
        q.awaitTermination(60)


if __name__ == "__main__":
    main()

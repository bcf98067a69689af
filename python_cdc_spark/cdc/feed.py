"""CDC event feeds as DataFrames.

The reference obtains its feed from a Postgres logical-replication socket
and decodes pgoutput frames one at a time
(``/root/reference/utils/postgre_cdc_consumer.py:68-110``,
``/root/reference/utils/pg_output_parser.py:15-39``). Capture is external
to this engine (per BASELINE.json's approach note); the engine-side
contract is a DataFrame with ``CDC_EVENT_SCHEMA``. Three producers:

- ``read_feed`` / ``read_feed_stream`` — JSON/parquet event directories,
  the durable hand-off format from any capture process (Debezium-style).
- ``events_as_cdc_feed`` — deterministically derives a CDC feed from the
  driver's ``events`` table so apply/SCD2 operators are oracle-checkable.
- ``golden_sequence_events`` — the reference's own manual test sequence
  (INSERT → UPDATE → DELETE on ``users``,
  ``/root/reference/test_changes.py:73-91``) as typed rows.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.schemas import CDC_EVENT_SCHEMA, UNCHANGED_SENTINEL


def read_feed(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """Batch-read a CDC event directory with the canonical schema.

    Unknown/corrupt records surface as nulls (PERMISSIVE), mirroring the
    reference's poison-message skip (``postgre_cdc_consumer.py:91-105``):
    drop-with-warning becomes filter-on-null downstream.
    """
    reader = spark.read.schema(CDC_EVENT_SCHEMA)
    return reader.parquet(path) if fmt == "parquet" else reader.json(path)


def read_feed_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming read of a CDC event directory.

    ``maxFilesPerTrigger`` is the Spark analog of the reference's bounded
    queue backpressure (``cdc_consumer.py:16,93``): it caps per-microbatch
    intake instead of blocking a producer thread.
    """
    reader = spark.readStream.schema(CDC_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path) if fmt == "parquet" else reader.json(path)


def events_as_cdc_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic CDC feed from the driver's ``events`` table.

    Mapping (fixed so a DuckDB oracle can reproduce it):

    - key          = ``user_id``
    - lsn          = ``event_id`` (monotone, unique)
    - operation    = signup → INSERT, error → DELETE, else UPDATE
    - new_values   = {value, event_type, props} for INSERT/UPDATE;
                     ``props`` is the ``[unchanged]`` TOAST sentinel for
                     'purchase' rows — exercising the reference's
                     unchanged-column semantics
                     (``pg_output_parser.py:112-113``) in a checkable way.
    - old_values   = key-only image {user_id} for UPDATE/DELETE,
                     mirroring replica-identity ``K`` tuples
                     (``pg_output_parser.py:175``).
    """
    ev = table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("INSERT"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    key_str = F.col("user_id").cast("string")
    new_vals = F.when(
        op != "DELETE",
        F.map_from_arrays(
            F.array(F.lit("value"), F.lit("event_type"), F.lit("props")),
            F.array(
                F.col("value").cast("string"),
                F.col("event_type"),
                F.when(F.col("event_type") == "purchase", F.lit(UNCHANGED_SENTINEL)).otherwise(
                    F.col("props")
                ),
            ),
        ),
    )
    old_vals = F.when(
        op != "INSERT",
        F.map_from_arrays(F.array(F.lit("user_id")), F.array(key_str)),
    )
    return ev.select(
        F.col("event_id").alias("lsn"),
        op.alias("operation"),
        F.lit("public").alias("schema"),
        F.lit("users_activity").alias("table"),
        F.array(F.lit("user_id"), F.lit("value"), F.lit("event_type"), F.lit("props")).alias(
            "columns"
        ),
        old_vals.alias("old_values"),
        new_vals.alias("new_values"),
        F.col("ts"),
        key_str.alias("key"),
    )


def golden_sequence_events(spark: SparkSession) -> DataFrame:
    """The reference's golden test sequence as a typed event feed.

    Replays ``test_changes.py:73-91``: INSERT a row, UPDATE its
    name/status, DELETE it — expected apply end-state: the row is gone
    (FIXTURES.md §A2).
    """
    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    cols = ["id", "name", "email", "status", "created_at", "updated_at"]
    base = {
        "id": "3",
        "name": "Test User",
        "email": "test@example.com",
        "status": "active",
        "created_at": "2024-01-01 12:00:00",
        "updated_at": "2024-01-01 12:00:00",
    }
    updated = dict(base, name="Updated User", status="inactive", updated_at="2024-01-01 12:00:01")
    rows = [
        (1, "INSERT", "public", "users", cols, None, base, t0),
        (2, "UPDATE", "public", "users", cols, base, updated, t0 + _dt.timedelta(seconds=1)),
        (3, "DELETE", "public", "users", cols, updated, None, t0 + _dt.timedelta(seconds=2)),
    ]
    return spark.createDataFrame(rows, CDC_EVENT_SCHEMA)

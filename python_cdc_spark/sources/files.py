"""File-format sources and sinks (E1/E2).

Thin on purpose: ``spark.read`` already provides schema enforcement,
corrupt-record channels, pushdown (parquet) and partition discovery.
The CDC-specific part is the feed-directory convention shared with
``cdc.feed``: newline-delimited JSON files with ``CDC_EVENT_SCHEMA``,
appended atomically (write temp + rename) so a concurrent streaming
reader never sees partial files.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from python_cdc_spark.schemas import CDC_EVENT_SCHEMA


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """JSON source with explicit schema (never infer on a data path —
    inference scans the input twice) and a corrupt-record channel, the
    declarative form of the reference's poison-message skip
    (``/root/reference/utils/postgre_cdc_consumer.py:91-105``)."""
    reader = spark.read
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if corrupt_col:
            schema = T.StructType(
                schema.fields + [T.StructField(corrupt_col, T.StringType(), True)]
            )
            reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_feed(events: DataFrame, path: str, mode: str = "append") -> None:
    """Write CDC events as a JSON feed directory (batch producer side)."""
    events.write.mode(mode).json(path)


def write_golden_feed(spark: SparkSession, path: str) -> str:
    """Materialize the reference's golden INSERT→UPDATE→DELETE sequence
    (``/root/reference/test_changes.py:73-91``) as a single atomically
    published feed file; returns the file path."""
    import json as _json

    from python_cdc_spark.cdc.feed import golden_sequence_events

    rows = golden_sequence_events(spark).toJSON().collect()
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}")
    final = os.path.join(path, "golden.json")
    with open(tmp, "w") as f:
        f.write("\n".join(rows) + "\n")
    os.rename(tmp, final)
    return final


FEED_SCHEMA = CDC_EVENT_SCHEMA

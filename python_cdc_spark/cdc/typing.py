"""Cast layer: untyped CDC string values → typed columns.

The reference decodes every column as UTF-8 text and never applies the
captured type OIDs (``/root/reference/utils/pg_output_parser.py:114-121``,
OIDs captured at ``:79,86`` but unused), so row images arrive as
``map<string,string>``. This module materializes them against a real
``StructType`` — the Spark analog of the registry the parser keeps at
``pg_output_parser.py:13`` with actual typing added.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cast_images_to_schema(
    df: DataFrame, image_col: str, schema: T.StructType, prefix: str = ""
) -> DataFrame:
    """Project ``image_col`` (map<string,string>) into typed columns.

    SQL NULL in the map stays NULL; the literal string 'null' is treated
    as a value (the reference never emits it — NULL columns use the wire
    tag ``n``, ``pg_output_parser.py:110-111``).
    """
    cols: list[Column] = [F.col(c) for c in df.columns]
    for field in schema.fields:
        cols.append(
            F.col(image_col).getItem(field.name).cast(field.dataType).alias(prefix + field.name)
        )
    return df.select(*cols)


def schema_registry_from_feed(events: DataFrame) -> DataFrame:
    """Dynamic schema discovery from the feed itself — the analog of the
    reference's Relation-message registry (``pg_output_parser.py:41-97``):
    per table, the union of observed column names with first/last lsn.

    Schema evolution by replacement (Postgres re-sends Relation on DDL)
    becomes: newer events simply carry the new column set; consumers read
    the registry to build casts.
    """
    return (
        events.select(
            "schema", "table", F.explode_outer("columns").alias("column"), "lsn"
        )
        .groupBy("schema", "table", "column")
        .agg(F.min("lsn").alias("first_lsn"), F.max("lsn").alias("last_lsn"))
    )

"""Typed schemas for the engine.

The CDC event schema mirrors the reference's ``CDCEvent`` dataclass
(``/root/reference/utils/cdc_event.py:6-14``) with one addition: ``lsn``.
The reference acks offsets with ``msg.data_start``
(``/root/reference/utils/postgre_cdc_consumer.py:99``) but never stores the
LSN on the event; deterministic ordering under parallel apply requires it,
so it is first-class here.

Values inside ``old_values`` / ``new_values`` are ``map<string,string>``
because the reference decodes every column as UTF-8 text and never applies
the captured type OIDs (``/root/reference/utils/pg_output_parser.py:114-121``).
A cast layer (``python_cdc_spark.cdc.typing``) converts to typed columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Sentinel the reference emits for TOASTed-unchanged columns
#: (``/root/reference/utils/pg_output_parser.py:112-113``). During apply,
#: a new-image value equal to this sentinel must COALESCE with the prior
#: row state, never overwrite it (SURVEY.md §7 hard-part 2).
UNCHANGED_SENTINEL = "[unchanged]"

#: Operations carried by the feed (``/root/reference/utils/cdc_event.py:8``).
OP_INSERT, OP_UPDATE, OP_DELETE = "INSERT", "UPDATE", "DELETE"

#: One row-level change event.  ``old_values`` is null for INSERT, and may
#: be key-only when the source replica identity sends ``K`` tuples
#: (``/root/reference/utils/pg_output_parser.py:175``); ``new_values`` is
#: null for DELETE.
CDC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("columns", T.ArrayType(T.StringType()), True),
        T.StructField("old_values", T.MapType(T.StringType(), T.StringType(), True), True),
        T.StructField("new_values", T.MapType(T.StringType(), T.StringType(), True), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: The reference's demo source table (``/root/reference/init.sql:2-9``),
#: typed as Spark sees it after the cast layer.
USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

#: Driver analytic tables (FIXTURES.md §B) — names only; parquet carries
#: its own schema, these are for validation/introspection.
ANALYTIC_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

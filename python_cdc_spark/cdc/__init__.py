"""CDC subsystem: the Spark-first rebuild of the reference's actual
capability surface (SURVEY.md §2.1 R1–R18).

The reference decodes Postgres pgoutput into row-change events and fans
them out to printing workers. Here the same semantics are expressed as:

- ``feed``      — CDC event feeds as (streaming) DataFrames (R1–R10).
- ``pgoutput``  — the binary wire-format codec itself (R3–R8): broadcast
  relation registry + Arrow-batched frame decode.
- ``apply``     — materialize current state from a feed (E18, flagship).
- ``scd2``      — slowly-changing-dimension type-2 history (E19).
- ``typing``    — the reference's untyped string values → typed columns.
- ``monitor``   — lag/throughput introspection (R15–R17 analogs).
"""

from python_cdc_spark.cdc.apply import apply_changes, latest_per_key  # noqa: F401
from python_cdc_spark.cdc.feed import (  # noqa: F401
    events_as_cdc_feed,
    golden_sequence_events,
    read_feed,
    read_feed_stream,
)
from python_cdc_spark.cdc.pgoutput import (  # noqa: F401
    decode_frames,
    relation_registry,
    relation_registry_versions,
)
from python_cdc_spark.cdc.scd2 import scd2_history  # noqa: F401
from python_cdc_spark.cdc.typing import cast_images_to_schema  # noqa: F401

"""Source/sink wrappers (E1/E2): parquet, JSON, CSV, CDC feed dirs."""

from python_cdc_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    write_feed,
    write_golden_feed,
)

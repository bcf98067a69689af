"""python_cdc_spark — a PySpark-native analytics + CDC engine.

A from-scratch rebuild of the capabilities of ``ashishasint/python-cdc``
(a Postgres logical-replication CDC consumer; see SURVEY.md) re-expressed
Spark-first:

- CDC ingestion → Structured Streaming / batch DataFrames over a typed
  change-event schema (``python_cdc_spark.schemas.CDC_EVENT_SCHEMA``).
- Apply-changes / SCD2 materialization → window + merge recipes
  (``python_cdc_spark.cdc``).
- Relational/analytic operator surface → DataFrame/SQL compositions
  registered in ``python_cdc_spark.queries`` with DuckDB oracle twins.
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) → ``operators/`` and ``functions/``.

Everything is designed for a multi-executor cluster at large scale:
declarative plans (Catalyst optimizes), broadcast of small dims, no
driver-side collect in data paths, partition-aware shuffles.
"""

__version__ = "0.1.0"

from python_cdc_spark.session import get_spark  # noqa: F401

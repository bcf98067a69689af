"""Monitoring & admin introspection (R15–R17 analogs).

The reference ships a WAL-lag SQL script (``/root/reference/check_wal.py:16-27``)
and admin queries over replication slots/publications
(``/root/reference/utils.py:14-97``). In Spark-world the equivalents are
``StreamingQuery.lastProgress`` and catalog introspection; this module
just shapes them into the same kind of report.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


def lag_metrics(query: StreamingQuery) -> dict[str, Any]:
    """Consumer-lag snapshot — the ``check_wal.py`` analog.

    Retained-WAL-bytes becomes backlog expressed in Spark's own progress
    metrics (rows/sec in vs processed, batch duration).
    """
    p = query.lastProgress or {}
    duration = (p.get("durationMs") or {}).get("triggerExecution")
    return {
        "query_id": str(query.id),
        "is_active": query.isActive,
        "batch_id": p.get("batchId"),
        "input_rows_per_second": p.get("inputRowsPerSecond"),
        "processed_rows_per_second": p.get("processedRowsPerSecond"),
        "num_input_rows": p.get("numInputRows"),
        "trigger_duration_ms": duration,
        "sources": [
            {
                "description": s.get("description"),
                "start_offset": s.get("startOffset"),
                "end_offset": s.get("endOffset"),
                "latest_offset": s.get("latestOffset"),
            }
            for s in p.get("sources", [])
        ],
    }


def health(query: StreamingQuery) -> dict[str, Any]:
    """The reference's HTTP health endpoint (``cdc_consumer.py:26-40``)
    returned static 200/'healthy'; this returns actual liveness."""
    return {
        "status": "healthy" if query.isActive else "stopped",
        "message": query.status.get("message") if query.status else None,
        "exception": query.exception().desc if query.exception() else None,
    }


def list_streams(spark: SparkSession) -> list[dict[str, Any]]:
    """Admin listing — ``utils.py:25-45`` (slots) analog: active streaming
    queries with their checkpoint 'slots'."""
    return [
        {"id": str(q.id), "run_id": str(q.runId), "name": q.name, "active": q.isActive}
        for q in spark.streams.active
    ]

"""Monitoring & admin introspection (R15–R17 analogs).

The reference ships a WAL-lag SQL script (``/root/reference/check_wal.py:16-27``)
and admin queries over replication slots/publications
(``/root/reference/utils.py:14-97``). In Spark-world the equivalents are
``StreamingQuery.lastProgress`` and catalog introspection; this module
just shapes them into the same kind of report.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
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


class HealthServer:
    """HTTP health endpoint served WHILE a streaming query runs — R15
    parity with the reference's health server
    (``cdc_consumer.py:26-40``: ``HTTPServer`` on ``$PORT`` in a daemon
    thread answering every GET with a static 200 "OK"). This one serves
    the real reports instead of a constant:

    - ``/health``  → :func:`health` JSON; HTTP 200 while the query is
      active, 503 once stopped/failed (so a probe actually probes).
    - ``/metrics`` → :func:`lag_metrics` JSON (the WAL-lag analog).
    - ``/streams`` → :func:`list_streams` JSON.
    - anything else → 404.

    ``port`` defaults to ``$PORT`` like the reference, else an ephemeral
    port; the bound port is in ``.port`` after ``start()``. The server
    thread is a daemon (dies with the driver) — stop it explicitly with
    ``stop()`` or use the instance as a context manager.
    """

    def __init__(
        self,
        spark: SparkSession,
        query: StreamingQuery,
        port: int | None = None,
        extra_metrics: Any = None,
    ) -> None:
        self.spark = spark
        self.query = query
        self.port = int(os.environ.get("PORT", "0")) if port is None else port
        #: optional zero-arg callable merged into ``/metrics`` (e.g. the
        #: applier's ``latency_report`` — capture→applied lag)
        self.extra_metrics = extra_metrics
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> int:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                try:
                    if self.path == "/health":
                        body = health(outer.query)
                        code = 200 if body["status"] == "healthy" else 503
                    elif self.path == "/metrics":
                        body, code = lag_metrics(outer.query), 200
                        if outer.extra_metrics is not None:
                            body["apply_latency"] = outer.extra_metrics()
                    elif self.path == "/streams":
                        body, code = list_streams(outer.spark), 200
                    else:
                        body, code = {"error": "not found"}, 404
                except Exception as exc:  # report, never kill the server
                    body, code = {"error": str(exc)}, 500
                payload = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, fmt: str, *args: Any) -> None:
                pass  # probes are chatty; keep driver logs clean

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True, name="cdc-health"
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        self._thread = None

    def __enter__(self) -> "HealthServer":
        self.start()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.stop()

"""Small literal tables built JVM-side — never via ``createDataFrame``.

``spark.createDataFrame(small_python_list)`` backs the frame with a
pickled RDD, and any job over it (count, broadcast materialization, and
worst of all a parquet write: ~5-7 s measured in this PySpark build)
pays Python-worker setup. A handful of literal rows can instead be a
pure SQL expression — ``explode`` of an array-of-structs literal —
which stays in the JVM, broadcasts instantly, and writes in ~0.2 s.

The expression is rendered as ONE SQL string and parsed in a single
``spark.sql`` call: building the same tree out of ``F.lit``/``F.struct``
Column objects costs one py4j round trip per node (~5 s for a 256-row
codebook — worse than the problem it solved), while parsing the
equivalent SQL text is milliseconds.

Use this for every small driver-side constant table on a hot path
(phrase maps, globals rows, centroid/codebook tables, relation
registries); ``createDataFrame`` remains fine for test fixtures.
"""

from __future__ import annotations

import datetime as _dt
import math as _math

from pyspark.sql import DataFrame, SparkSession


def _render(v, t: str) -> str:
    """SQL literal for a plain Python value, cast to ``t``. Floats use
    repr (shortest round-trip), which Spark parses to the identical
    IEEE double — oracle-parity-safe."""
    if v is None:
        return f"CAST(NULL AS {t})"
    if isinstance(v, bool):
        return f"CAST({'true' if v else 'false'} AS {t})"
    if isinstance(v, (bytes, bytearray)):
        return f"CAST(X'{bytes(v).hex().upper()}' AS {t})"
    if isinstance(v, str):
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"CAST('{esc}' AS {t})"
    if isinstance(v, float):
        if not _math.isfinite(v):
            raise ValueError(f"non-finite literal {v!r} not supported")
        return f"CAST({v!r} AS {t})"
    if isinstance(v, int):
        return f"CAST({v} AS {t})"
    if isinstance(v, _dt.datetime):
        return f"CAST('{v.isoformat(sep=' ')}' AS {t})"
    if isinstance(v, _dt.date):
        return f"CAST('{v.isoformat()}' AS {t})"
    if isinstance(v, (list, tuple)):
        inner = t.strip()
        assert inner.lower().startswith("array<") and inner.endswith(">"), (
            f"list value needs array<...> type, got {t}"
        )
        et = inner[6:-1]
        return "array(" + ", ".join(_render(x, et) for x in v) + ")"
    raise TypeError(f"unsupported literal type {type(v).__name__}")


def literal_df(
    spark: SparkSession,
    rows: list[tuple],
    cols: list[tuple[str, str]],
) -> DataFrame:
    """JVM-side literal table: ``rows`` are plain Python tuples, ``cols``
    is ``[(name, sql_type), ...]``. Handles ints/floats/strings/bools/
    bytes/None/datetimes and flat lists (array<...> columns)."""
    structs = [
        "named_struct("
        + ", ".join(
            f"'{n}', {_render(v, t)}" for v, (n, t) in zip(row, cols)
        )
        + ")"
        for row in rows
    ]
    proj = ", ".join(f"r.{n} AS {n}" for n, _ in cols)
    sql = (
        f"SELECT {proj} FROM (SELECT explode(array("
        + ", ".join(structs)
        + ")) AS r)"
    )
    return spark.sql(sql)

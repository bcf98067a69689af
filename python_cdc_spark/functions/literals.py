"""Small literal tables built JVM-side — never via ``createDataFrame``.

``spark.createDataFrame(small_python_list)`` backs the frame with a
pickled RDD, and any job over it (count, broadcast materialization, and
worst of all a parquet write: ~5-7 s measured in this PySpark build)
pays Python-worker setup. A handful of literal rows can instead be a
pure Catalyst expression — ``explode`` of an array-of-structs literal
over ``range(1)`` — which stays in the JVM, broadcasts instantly, and
writes in ~0.2 s. Use this for every small driver-side constant table
on a hot path (phrase maps, globals rows, centroid tables, relation
registries); ``createDataFrame`` remains fine for test fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def literal_df(
    spark: SparkSession,
    rows: list[tuple],
    cols: list[tuple[str, str]],
) -> DataFrame:
    """JVM-side literal table: ``rows`` are plain Python tuples, ``cols``
    is ``[(name, sql_type), ...]``. Handles ints/floats/strings/bools/
    None and flat lists (array<...> columns)."""
    structs = [
        F.struct(
            *[
                F.lit(bytes(v) if isinstance(v, bytearray) else v).cast(t).alias(n)
                for v, (n, t) in zip(row, cols)
            ]
        )
        for row in rows
    ]
    out = spark.range(1).select(F.explode(F.array(*structs)).alias("r"))
    return out.select(*[F.col(f"r.{n}").alias(n) for n, _ in cols])

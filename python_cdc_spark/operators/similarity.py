"""Similarity search over embedding columns (E26).

- ``brute_force_top_k`` — exact cosine top-k: query set × corpus with
  the query side broadcast, window top-k per query. The correctness
  baseline; O(|Q|·|C|) but embarrassingly parallel and shuffle-free on
  the corpus side (queries broadcast, no corpus repartition).
- ``hyperplane_lsh_buckets`` — random-hyperplane (SimHash-for-vectors)
  LSH: sign pattern of dot products with deterministic ±1 hyperplanes →
  bucket key. The scale path: candidate generation touches only
  same-bucket pairs. Hyperplane weights derive from md5 parity so any
  engine reproduces them (oracle-checkable, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.functions.vectors import cosine_similarity
from python_cdc_spark.operators.dedup import _spread


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rnk), excluding self-pairs.
    Deterministic: ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # |Q|·|corpus| dot products are compute-bound: make sure the corpus
    # side has enough partitions to use every core (small parquet inputs
    # arrive as a single split)
    c = _spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    )
    sim = cosine_similarity(F.col("q_vec"), F.col("c_vec"), exact=exact)
    scored = (
        c.join(broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def hyperplane_weights(planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane weight matrix: weight(p, d) = +1 if
    the first hex digit of md5('<p>|<d>') is even, else -1. Computed
    driver-side once (no RNG state, reproducible by any md5
    implementation — which keeps the oracle SQL identical)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0] in "02468ace" else -1
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def _projection(vec: Column, weights: list[int]) -> Column:
    """±sum of vector elements in fixed dim order (left-assoc adds →
    identical IEEE result on any engine writing terms in the same
    order)."""
    terms = None
    for d, w in enumerate(weights):
        x = F.get(vec, d).cast("double")
        t = x if w > 0 else -x
        terms = t if terms is None else terms + t
    return terms


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    dims: int = 64,
) -> DataFrame:
    """Assign each vector an LSH bucket = packed sign bits of ``planes``
    deterministic hyperplane projections. Same bucket ⇒ low angular
    distance with high probability; bucket join replaces the O(n²)
    cross-join at scale. Sign at exactly 0 resolves as >= 0 → 1."""
    ws = hyperplane_weights(planes, dims)
    bucket = None
    for p in range(planes):
        bit = F.when(_projection(F.col(vec_col), ws[p]) >= 0, F.lit(1)).otherwise(F.lit(0))
        term = bit.cast("long") * (2**p)
        bucket = term if bucket is None else bucket + term
    return _spread(df).select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def hyperplane_lsh_tables(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 4,
    planes_per_table: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Multi-table LSH: ``tables`` independent bucket assignments, each
    from its own ``planes_per_table`` hyperplanes (table t uses absolute
    planes [t·ppt, (t+1)·ppt)). Candidates are the UNION of same-bucket
    pairs across tables — the standard recall lever: one 2^p-bucket
    table prunes hard but misses neighbors split by any single
    hyperplane; L tables only miss pairs split in EVERY table.

    Returns (id, table_id, bucket) stacked — join on (table_id, bucket).
    """
    ws = hyperplane_weights(tables * planes_per_table, dims)
    bucket_cols = []
    for t in range(tables):
        bucket = None
        for j in range(planes_per_table):
            bit = F.when(
                _projection(F.col(vec_col), ws[t * planes_per_table + j]) >= 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            term = bit.cast("long") * (2**j)
            bucket = term if bucket is None else bucket + term
        bucket_cols.append(bucket.alias(f"b_{t}"))
    banded = _spread(df).select(F.col(id_col).alias("id"), *bucket_cols)
    return banded.select(
        "id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(t) for t in range(tables)]),
                F.array(*[F.col(f"b_{t}") for t in range(tables)]),
            )
        ).alias("table_id", "bucket"),
    )


def _sql_bucket_terms(vec_expr: str, ws_rows: list[list[int]]) -> str:
    parts = []
    for j, row in enumerate(ws_rows):
        terms = " + ".join(
            ("" if w > 0 else "-") + f"CAST({vec_expr}[{d + 1}] AS DOUBLE)"
            for d, w in enumerate(row)
        ).replace("+ -", "- ")
        parts.append(f"(CASE WHEN ({terms}) >= 0 THEN {2**j} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def sql_hyperplane_bucket(vec_expr: str, planes: int, dims: int) -> str:
    """DuckDB twin of ``hyperplane_lsh_buckets``'s bucket expression."""
    return _sql_bucket_terms(vec_expr, hyperplane_weights(planes, dims))


def sql_hyperplane_table_bucket(
    vec_expr: str, table: int, tables: int, planes_per_table: int, dims: int
) -> str:
    """DuckDB twin of one table's bucket in ``hyperplane_lsh_tables``."""
    ws = hyperplane_weights(tables * planes_per_table, dims)
    rows = ws[table * planes_per_table : (table + 1) * planes_per_table]
    return _sql_bucket_terms(vec_expr, rows)

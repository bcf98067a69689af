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


def sql_hyperplane_bucket(vec_expr: str, planes: int, dims: int) -> str:
    """DuckDB twin of ``hyperplane_lsh_buckets``'s bucket expression."""
    ws = hyperplane_weights(planes, dims)
    parts = []
    for p in range(planes):
        terms = " + ".join(
            ("" if w > 0 else "-") + f"CAST({vec_expr}[{d + 1}] AS DOUBLE)"
            for d, w in enumerate(ws[p])
        ).replace("+ -", "- ")
        parts.append(f"(CASE WHEN ({terms}) >= 0 THEN {2**p} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"

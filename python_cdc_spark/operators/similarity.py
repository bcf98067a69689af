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

from pyspark.sql import DataFrame, SparkSession, Window
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
    dims: int = 64,
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
    if exact:
        sim = cosine_similarity(F.col("q_vec"), F.col("c_vec"), exact=True)
    else:
        # codegen'd explicit-term expressions: ~10× the interpreted
        # higher-order-function fold on the hot pair stream
        from python_cdc_spark.functions.vectors import dot_expr, norm_expr

        sim = dot_expr("q_vec", "c_vec", dims) / (
            norm_expr("q_vec", dims) * norm_expr("c_vec", dims)
        )
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


def _projection_sql(vec_col: str, weights: list[int]) -> str:
    """±sum of vector elements in fixed dim order as a Spark SQL string
    (0-based element access). Left-assoc adds → identical IEEE result on
    any engine writing terms in the same order. A generated string fed
    to one ``F.expr`` instead of a py4j Column tree: building 16 planes
    × 64 terms as Column objects costs ~1k driver round-trips and a
    deep tree Catalyst analyzes slowly — measured ~20× slower than the
    string form at identical semantics."""
    return " + ".join(
        ("" if w > 0 else "-") + f"CAST({vec_col}[{d}] AS DOUBLE)"
        for d, w in enumerate(weights)
    ).replace("+ -", "- ")


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
    parts = [
        f"(CASE WHEN ({_projection_sql(vec_col, ws[p])}) >= 0 THEN {2**p} ELSE 0 END)"
        for p in range(planes)
    ]
    bucket = F.expr("CAST(" + " + ".join(parts) + " AS BIGINT)")
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
        parts = [
            "(CASE WHEN "
            f"({_projection_sql(vec_col, ws[t * planes_per_table + j])}) >= 0 "
            f"THEN {2**j} ELSE 0 END)"
            for j in range(planes_per_table)
        ]
        bucket_cols.append(
            F.expr("CAST(" + " + ".join(parts) + " AS BIGINT)").alias(f"b_{t}")
        )
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


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
    exact: bool = True,
    dims: int = 64,
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd) — the IVF coarse quantizer.

    Every step is distributed DataFrame work; only the k centroids (k
    rows × dims doubles — metadata-scale) collect to the driver between
    iterations, so the loop is ``iters`` Spark jobs, each one shuffle
    (the per-cell mean), regardless of corpus size.

    Deterministic + oracle-replayable by construction:

    - init: hash-partitioned reservoir pick — cell ``i`` seeds from the
      vector whose ``md5(id)`` is smallest among ids hashing to ``i``
      (two leading hex digits mod k). No RNG, no global sort/window,
      no corpus count: ONE hash aggregation regardless of corpus size,
      and md5 keeps it replayable by any engine. (A cell with no id
      hashing to it — only possible when n is not ≫ k — simply starts
      empty and the fit proceeds with the populated cells.)
    - assignment: argmax of dot(v, c)/‖c‖ (cosine is invariant to the
      query's own norm), ties → lowest cell id. ``exact`` routes the
      reduction through decimals so an external engine reproduces the
      argmax bit-for-bit.
    - update: per-dimension decimal-routed mean. Spherical k-means needs
      no centroid normalization — cosine ignores centroid scale.

    Returns a k-row DataFrame (cell int, cvec array<double>).
    """
    spark = corpus.sparkSession
    hexa = "0123456789abcdef"
    cell_expr = (
        f"CAST((  (locate(substring(md5(cast({id_col} as string)), 1, 1), '{hexa}') - 1) * 16"
        f"      + (locate(substring(md5(cast({id_col} as string)), 2, 1), '{hexa}') - 1)"
        f"     ) % {k} AS INT)"
    )
    init = (
        corpus.select(
            F.expr(cell_expr).alias("cell"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
        )
        .groupBy("cell")
        .agg(F.min_by("__vec", "__h").alias("cvec"))
    )
    cent = _collect_centroids(init)

    dec = "decimal(30,12)"
    for _ in range(iters):
        cent_df = _centroid_df(spark, cent)
        assigned = kmeans_assign(corpus, cent_df, id_col, vec_col, exact=exact, dims=dims)
        if exact:
            mean_val = (
                F.round(F.sum(F.col("val").cast("double").cast(dec)), 6).cast("double")
                / F.count("val")
            ).alias("cval")
        else:
            mean_val = F.avg(F.col("val").cast("double")).alias("cval")
        cdims = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(mean_val)
        )
        new_cent = cdims.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s.getField("cval"),
            ).alias("cvec")
        )
        cent = _collect_centroids(new_cent)
    return _centroid_df(spark, cent)


def _centroid_df(spark: SparkSession, cent: list[tuple[int, list[float]]]) -> DataFrame:
    """Centroid table as a JVM-side literal (functions/literals.py):
    createDataFrame would back it with a pickled RDD and every
    assign-join iteration would pay a Python-worker job to broadcast it."""
    from python_cdc_spark.functions.literals import literal_df

    return literal_df(spark, cent, [("cell", "int"), ("cvec", "array<double>")])


def _collect_centroids(df: DataFrame) -> list[tuple[int, list[float]]]:
    return sorted(
        ((int(r["cell"]), [float(x) for x in r["cvec"]]) for r in df.collect()),
        key=lambda t: t[0],
    )


def kmeans_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    n_best: int = 1,
    dims: int = 64,
) -> DataFrame:
    """Assign each vector its ``n_best`` closest cells by centroid cosine
    (``n_best > 1`` = the query-side multi-probe). Broadcast of k rows,
    window argmax per vector — no corpus shuffle. Centroid norms are
    precomputed on the k-row side (a pure function of cvec, so the
    value is identical to the oracle's inline recomputation)."""
    from python_cdc_spark.functions.vectors import dec_dot_product, dot_expr
    from python_cdc_spark.functions.vectors import l2_norm as _l2

    cent = centroids.withColumn("cnrm", _l2(F.col("cvec"), exact=exact))
    if exact:
        dot = dec_dot_product(F.col(vec_col), F.col("cvec"))
    else:
        dot = dot_expr(vec_col, "cvec", dims)
    score = dot / F.col("cnrm")
    scored = (
        _spread(corpus).crossJoin(broadcast(cent)).withColumn("__score", score)
    )
    if n_best == 1:
        # hash-agg argmax (max score, ties → lowest cell) instead of a
        # sort-window: one partial-aggregating shuffle per Lloyd
        # iteration, same result as row_number()=1
        payload = [c for c in corpus.columns if c != id_col] + ["cell"]
        key = F.struct(F.col("__score"), (F.lit(0) - F.col("cell")).alias("__nc"))
        return (
            scored.groupBy(id_col)
            .agg(F.max_by(F.struct(*payload), key).alias("__best"))
            .select(id_col, "__best.*")
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.asc("cell"))
    return (
        scored.withColumn("__arnk", F.row_number().over(w))
        .filter(F.col("__arnk") <= n_best)
        .drop("__score", "__arnk", "cvec", "cnrm")
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

"""Similarity-search + multimodal queries over embeddings (E26, E28).

Brute-force exact cosine is the correctness baseline; hyperplane-LSH
bucketing is the scale path (both oracle-checked — the LSH hyperplanes
are deterministic md5-parity constants shared with the SQL twin).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.functions.text import token_count
from python_cdc_spark.functions.vectors import (
    cosine_similarity,
    dec_dot_product,
    l2_norm,
    sql_dec_dot,
    sql_dec_norm,
)
from python_cdc_spark.io import table
from python_cdc_spark.operators.similarity import (
    brute_force_top_k,
    hyperplane_lsh_buckets,
    sql_hyperplane_bucket,
    sql_hyperplane_table_bucket,
)
from python_cdc_spark.queries.registry import register

_DIMS = 64
_PLANES = 6
_TABLES, _PPT = 4, 4  # multi-table LSH; >20 total planes breaks 64KB codegen
_TOPK = 5


@register(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dims,
           {sql_dec_norm('embedding', _DIMS)} AS l2
    FROM embeddings
    """,
    doc="E26: per-vector L2 norms (decimal-exact reduction)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dims"),
        l2_norm(F.col("embedding"), exact=True).alias("l2"),
    )


@register(
    "similarity_brute_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0
    ),
    n AS (SELECT vec_id, {sql_dec_norm('embedding', _DIMS)} AS nrm FROM embeddings),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {sql_dec_dot('q.qv', 'e.embedding', _DIMS)} / (nq.nrm * ne.nrm) AS cosine
      FROM q
      JOIN embeddings e ON e.vec_id <> q.query_id
      JOIN n nq ON nq.vec_id = q.query_id
      JOIN n ne ON ne.vec_id = e.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= {_TOPK}
    """,
    doc="E26: exact cosine top-k ANN baseline (broadcast queries, window top-k)",
)
def similarity_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_top_k(e, queries, "vec_id", "embedding", k=_TOPK, exact=True)


@register(
    "similarity_lsh_buckets",
    oracle=f"""
    SELECT vec_id AS id, {sql_hyperplane_bucket('embedding', _PLANES, _DIMS)} AS bucket
    FROM embeddings
    """,
    doc="E26: random-hyperplane LSH bucket assignment (ANN scale path)",
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hyperplane_lsh_buckets(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        planes=_PLANES, dims=_DIMS,
    )


@register(
    "similarity_ann_lsh_topk",
    oracle=f"""
    WITH stacked AS (
      {" UNION ALL ".join(
          f"SELECT vec_id AS id, {t} AS table_id, "
          + sql_hyperplane_table_bucket("embedding", t, _TABLES, _PPT, _DIMS)
          + " AS bucket FROM embeddings"
          for t in range(_TABLES)
      )}
    ),
    cand AS (
      SELECT DISTINCT x.id AS query_id, y.id AS neighbor_id
      FROM stacked x JOIN stacked y
        ON x.table_id = y.table_id AND x.bucket = y.bucket AND x.id <> y.id
      WHERE x.id % 100 = 0
    ),
    n AS (SELECT vec_id, {sql_dec_norm('embedding', _DIMS)} AS nrm FROM embeddings)
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT c.query_id, c.neighbor_id,
             {sql_dec_dot('q.embedding', 'e.embedding', _DIMS)} / (nq.nrm * ne.nrm)
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
                    {sql_dec_dot('q.embedding', 'e.embedding', _DIMS)} / (nq.nrm * ne.nrm)
                    DESC, c.neighbor_id) AS BIGINT) AS rnk
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings e ON e.vec_id = c.neighbor_id
      JOIN n nq ON nq.vec_id = c.query_id
      JOIN n ne ON ne.vec_id = c.neighbor_id
    ) WHERE rnk <= {_TOPK}
    """,
    doc="E26: multi-table LSH ANN top-k — union of candidates from "
    f"{4} independent hyperplane tables, exact re-rank",
)
def similarity_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path with the recall lever: L independent LSH tables;
    a true neighbor is missed only if some hyperplane separates the
    pair in EVERY table. Candidate generation joins (table_id, bucket)
    stacks — shuffles ids, never vectors; exact cosine re-ranks the
    union (measured recall@5 vs brute force in tests)."""
    return _ann_lsh_topk(spark, sf_dir, exact=True)


def ann_lsh_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench/scale variant: identical plan shape, plain double math in
    the re-rank (the decimal routing exists only for oracle hashing)."""
    return _ann_lsh_topk(spark, sf_dir, exact=False)


def _ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    stacked: DataFrame | None = None,
) -> DataFrame:
    from python_cdc_spark.operators.similarity import hyperplane_lsh_tables

    e = table(spark, sf_dir, "embeddings")
    if stacked is None:
        # both join sides below read ``stacked``; checkpoint so the 16
        # hyperplane projections run once over the corpus, not twice.
        # (A caller amortizing index build across queries passes a
        # pre-materialized table — the ANN build/query convention.)
        stacked = hyperplane_lsh_tables(
            e, "vec_id", "embedding", _TABLES, _PPT, _DIMS
        ).localCheckpoint(eager=False)
    x = stacked.filter(F.col("id") % 100 == 0).select(
        F.col("id").alias("query_id"), "table_id", "bucket"
    )
    y = stacked.select(F.col("id").alias("neighbor_id"), "table_id", "bucket")
    cand = (
        x.join(y, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _rerank_topk(e, cand, exact=exact)


def _rerank_topk(e: DataFrame, cand: DataFrame, exact: bool, k: int = _TOPK) -> DataFrame:
    """Exact-cosine re-rank of (query_id, neighbor_id) candidate pairs.

    Norms computed once per vector (not per pair). Query side broadcasts
    — queries are a bounded working set (the 1% sample here; in
    production the user's query batch). The neighbor side must NOT
    broadcast: it is the whole corpus. ``shuffle_hash`` co-partitions
    candidates and corpus vectors on neighbor_id, so each vector ships
    only to the partitions whose candidates reference it — bounded
    memory at any corpus size, where a corpus broadcast OOMs every
    executor."""
    from python_cdc_spark.functions.vectors import dot_expr, norm_expr

    nrm = (
        l2_norm(F.col("embedding"), exact=True)
        if exact
        else norm_expr("embedding", _DIMS)
    )
    norms = e.select("vec_id", nrm.alias("nrm"))
    # Bound the broadcast side BEFORE broadcasting: semi-join the corpus
    # down to the distinct query ids that actually appear in ``cand``.
    # Without this, ``qv`` is the full corpus joined to its norms and the
    # broadcast below ships every vector to every executor — exactly the
    # OOM the neighbor-side shuffle_hash exists to avoid (ADVICE r2).
    # The semi-join's small side is the bounded query-id list, so it
    # broadcasts ids, never vectors.
    qids = cand.select("query_id").distinct()
    qv = (
        e.join(norms, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("nrm").alias("q_nrm"),
        )
        .join(broadcast(qids), "query_id", "left_semi")
    )
    ev = e.join(norms, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = dec_dot_product(F.col("qv"), F.col("cv")) if exact else dot_expr("qv", "cv", _DIMS)
    cos = dot / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(broadcast(qv), "query_id")
        .join(ev.hint("shuffle_hash"), "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


@register(
    "multimodal_doc_embedding_join",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source,
           CAST(length(d.text) AS BIGINT) AS n_chars,
           CAST(len(string_split(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')), ' '))
                AS BIGINT) AS n_tokens,
           e.label,
           {sql_dec_norm('e.embedding', _DIMS)} AS embedding_l2
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="E28: multimodal join — text features alongside embedding features",
)
def multimodal_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        token_count(F.col("text")).alias("n_tokens"),
        "label",
        l2_norm(F.col("embedding"), exact=True).alias("embedding_l2"),
    )


_IVF_K, _IVF_ITERS, _NPROBE = 16, 3, 4


def _sql_ivf_oracle(k: int, iters: int, nprobe: int, topk: int, dims: int) -> str:
    """DuckDB replay of the distributed k-means IVF: the same
    hash-partitioned init (min-md5 per two-hex-digit cell), Lloyd
    iterations with decimal-routed assignment/means, query multi-probe,
    and exact re-rank — bit-identical because every floating reduction
    is decimal-routed on both engines."""

    def score(vec: str, cent: str) -> str:
        return f"{sql_dec_dot(vec, cent, dims)} / {sql_dec_norm(cent, dims)}"

    ctes = [
        f"""cent0 AS (
      SELECT CAST((  (strpos('0123456789abcdef',
                             substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef',
                             substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1)
                  ) % {k} AS INTEGER) AS cell,
             min_by(embedding, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM embeddings GROUP BY 1
    )""",
    ]
    assign_body = """
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score} DESC, c.cell) AS arnk
        FROM embeddings e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """
    for it in range(1, iters + 1):
        ctes.append(
            f"assign{it} AS ({assign_body.format(score=score('e.embedding', 'c.cvec'), cent=f'cent{it - 1}')})"
        )
        ctes.append(
            f"""cd{it} AS (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.embedding[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM assign{it} a, UNNEST(generate_series(1, {dims})) p(i)
      GROUP BY cell, p.i
    )"""
        )
        ctes.append(
            f"cent{it} AS (SELECT cell, list(cval ORDER BY pos) AS cvec FROM cd{it} GROUP BY cell)"
        )
    ctes.append(
        f"assignF AS ({assign_body.format(score=score('e.embedding', 'c.cvec'), cent=f'cent{iters}')})"
    )
    ctes.append(
        f"""probe AS (
      SELECT query_id, cell FROM (
        SELECT e.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score('e.embedding', 'c.cvec')} DESC, c.cell) AS prnk
        FROM embeddings e CROSS JOIN cent{iters} c
        WHERE e.vec_id % 100 = 0
      ) WHERE prnk <= {nprobe}
    )"""
    )
    ctes.append(
        """cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN assignF a ON a.cell = p.cell AND a.vec_id <> p.query_id
    )"""
    )
    ctes.append(
        f"nrms AS (SELECT vec_id, {sql_dec_norm('embedding', dims)} AS nrm FROM embeddings)"
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT c.query_id, c.neighbor_id,
             {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
                    {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
                    DESC, c.neighbor_id) AS BIGINT) AS rnk
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings e ON e.vec_id = c.neighbor_id
      JOIN nrms nq ON nq.vec_id = c.query_id
      JOIN nrms ne ON ne.vec_id = c.neighbor_id
    ) WHERE rnk <= {topk}
    """


@register(
    "similarity_ivf_topk",
    oracle=_sql_ivf_oracle(_IVF_K, _IVF_ITERS, _NPROBE, _TOPK, _DIMS),
    doc=f"E26: IVF ANN — distributed spherical k-means quantizer "
    f"(k={_IVF_K}, {_IVF_ITERS} Lloyd iterations), nprobe={_NPROBE} "
    "multi-probe, exact re-rank within probed cells",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file ANN: a real k-means coarse quantizer (fitted
    distributed, centroids collected between iterations — k rows), each
    query probes its nprobe best cells and exact-ranks only those —
    search cost O(N·nprobe/k) per query instead of O(N). Measured
    recall@5 ≥ 0.5 vs brute force at sf0.1 (tests/test_operators.py)."""
    return _ivf_topk(spark, sf_dir, exact=True)


def ivf_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench/scale variant: identical pipeline, double math (no decimal
    routing — that exists only for oracle hashing)."""
    return _ivf_topk(spark, sf_dir, exact=False)


_IVF_CENT_CACHE: dict[tuple, list] = {}


def _fitted_centroids(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    k: int | None = None,
    iters: int | None = None,
) -> DataFrame:
    """The IVF index-build step: fit once per (corpus, mode, k, iters),
    reuse for every query — the standard ANN contract (index
    construction is amortized; per-query cost is probe + re-rank). The
    cache stores the collected k×dims centroid list, so it is
    session-independent and deterministic (the fit itself is
    deterministic, see kmeans_fit). Default knobs are the shared IVF
    coarse quantizer; the IVF-RQ composite passes its finer k."""
    from python_cdc_spark.operators.similarity import _collect_centroids, kmeans_fit

    k = _IVF_K if k is None else k
    iters = _IVF_ITERS if iters is None else iters
    key = (sf_dir, exact, k, iters)
    if key not in _IVF_CENT_CACHE:
        e = table(spark, sf_dir, "embeddings")
        _IVF_CENT_CACHE[key] = _collect_centroids(
            kmeans_fit(e, "vec_id", "embedding", k=k, iters=iters, exact=exact)
        )
    from python_cdc_spark.functions.literals import literal_df

    return literal_df(
        spark, _IVF_CENT_CACHE[key], [("cell", "int"), ("cvec", "array<double>")]
    )


_PQ_M, _PQ_K, _PQ_ITERS, _PQ_SHORTLIST = 4, 16, 2, 64


def _sql_pq_oracle(m: int, k: int, iters: int, shortlist: int, topk: int, dims: int) -> str:
    """DuckDB replay of the full PQ pipeline: m independent sub-space
    k-means fits (identical init/Lloyd machinery to the IVF oracle,
    applied to list_slice sub-vectors), corpus encoding, the ADC
    lookup-table scan with decimal-routed partial sums, the approx
    shortlist, and the exact re-rank — bit-identical end-to-end because
    every floating reduction is decimal-routed on both engines."""
    from python_cdc_spark.functions.vectors import sql_dec_dot_terms

    d = dims // m

    def score(vec: str, cent: str) -> str:
        return f"{sql_dec_dot(vec, cent, d)} / {sql_dec_norm(cent, d)}"

    cell_of = (
        "CAST((  (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16"
        "      + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1)"
        f"     ) % {k} AS INTEGER)"
    )
    assign_body = """
      SELECT vec_id, subv, cell FROM (
        SELECT e.vec_id, e.subv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score} DESC, c.cell) AS arnk
        FROM sub{s} e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """
    ctes = []
    for s in range(m):
        lo = s * d
        ctes.append(
            f"sub{s} AS (SELECT vec_id, list_slice(embedding, {lo + 1}, {lo + d}) AS subv FROM embeddings)"
        )
        ctes.append(
            f"""cent{s}_0 AS (
      SELECT {cell_of} AS cell,
             min_by(subv, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM sub{s} GROUP BY 1
    )"""
        )
        for it in range(1, iters + 1):
            ctes.append(
                f"asg{s}_{it} AS ({assign_body.format(score=score('e.subv', 'c.cvec'), s=s, cent=f'cent{s}_{it - 1}')})"
            )
            ctes.append(
                f"""cd{s}_{it} AS (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.subv[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM asg{s}_{it} a, UNNEST(generate_series(1, {d})) p(i)
      GROUP BY cell, p.i
    )"""
            )
            ctes.append(
                f"cent{s}_{it} AS (SELECT cell, list(cval ORDER BY pos) AS cvec FROM cd{s}_{it} GROUP BY cell)"
            )
        ctes.append(
            f"asg{s}_F AS ({assign_body.format(score=score('e.subv', 'c.cvec'), s=s, cent=f'cent{s}_{iters}')})"
        )
        ctes.append(
            f"qsub{s} AS (SELECT vec_id, subv FROM sub{s} WHERE vec_id % 100 = 0)"
        )
    ctes.append(
        "codes AS ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {s} AS sub, cell AS code FROM asg{s}_F" for s in range(m)
        )
        + ")"
    )
    ctes.append(
        "lut AS ("
        + " UNION ALL ".join(
            f"SELECT q.vec_id AS query_id, {s} AS sub, c.cell AS code, "
            f"{sql_dec_dot_terms('q.subv', 'c.cvec', d)} AS pdot, "
            f"{sql_dec_dot_terms('c.cvec', 'c.cvec', d)} AS cn2 "
            f"FROM qsub{s} q CROSS JOIN cent{s}_{iters} c"
            for s in range(m)
        )
        + ")"
    )
    ctes.append(
        """scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             CAST(ROUND(SUM(l.pdot), 6) AS DOUBLE) AS qdot,
             CAST(ROUND(SUM(l.cn2), 6) AS DOUBLE) AS n2
      FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
      WHERE c.vec_id <> l.query_id
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""shortl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY qdot / sqrt(n2) DESC, neighbor_id) AS srnk
        FROM scored
      ) WHERE srnk <= {shortlist}
    )"""
    )
    ctes.append(
        f"nrms AS (SELECT vec_id, {sql_dec_norm('embedding', dims)} AS nrm FROM embeddings)"
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT s.query_id, s.neighbor_id,
             {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
                    {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
                    DESC, s.neighbor_id) AS BIGINT) AS rnk
      FROM shortl s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings e ON e.vec_id = s.neighbor_id
      JOIN nrms nq ON nq.vec_id = s.query_id
      JOIN nrms ne ON ne.vec_id = s.neighbor_id
    ) WHERE rnk <= {topk}
    """


@register(
    "similarity_pq_topk",
    oracle=_sql_pq_oracle(_PQ_M, _PQ_K, _PQ_ITERS, _PQ_SHORTLIST, _TOPK, _DIMS),
    doc=f"E26: product-quantization ANN — m={_PQ_M} sub-codebooks "
    f"(k={_PQ_K}, {_PQ_ITERS} Lloyd iterations each), ADC codes-only "
    f"scan, shortlist={_PQ_SHORTLIST}, exact re-rank",
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN: vectors compressed to m 1-byte codes (128× at this
    setting); query scoring reads ONLY the codes table via a broadcast
    ADC lookup table, true vectors touched just for the per-query
    shortlist re-rank — the memory shape that scales to corpora whose
    raw vectors no longer fit anywhere (operators/pq.py). Recall@5 vs
    brute force asserted in tests/test_operators.py."""
    return _pq_topk(spark, sf_dir, exact=True)


def pq_topk_fast(
    spark: SparkSession, sf_dir: str, codes: DataFrame | None = None
) -> DataFrame:
    """Bench/scale variant: identical pipeline, double math (decimal
    routing exists only for oracle hashing); a caller amortizing index
    build across queries passes pre-materialized codes."""
    return _pq_topk(spark, sf_dir, exact=False, codes=codes)


# ---------------------------------------------------------------------------
# Persistent index plumbing — the build-once / query-many contract.
#
# The registered ANN queries LOAD the on-disk index when a current one
# exists and only fit on miss (then save, so the next session loads).
# At 100 TB an index build per query is the anti-pattern; the query path
# must read a prebuilt structure. The fit is deterministic (md5-seeded
# k-means) and doubles round-trip parquet bit-exactly, so load-vs-fit
# yields identical results — the DuckDB oracles replay the fit-on-miss
# path and stay green either way. Indexes are keyed by a stat-only
# fingerprint of the source parquet (testdata regenerates between
# rounds; a stale index must never be loaded).
# ---------------------------------------------------------------------------


def _ann_index_root() -> str:
    env = os.environ.get("SPARK_GRAFT_ANN_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, ".ann_index")


def _index_dir(sf_dir: str, kind: str, exact: bool) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        _ann_index_root(), base, f"{kind}_{'exact' if exact else 'fast'}"
    )


def _emb_fingerprint(sf_dir: str) -> str:
    from python_cdc_spark.operators.ann_index import source_fingerprint

    return source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))


def _pq_index(
    spark: SparkSession, sf_dir: str, exact: bool
) -> tuple[DataFrame, DataFrame]:
    """(codebook, codes) for the flat PQ scan — loaded from the persisted
    index when current, fit-and-saved on miss."""
    from python_cdc_spark.operators.ann_index import (
        index_is_current,
        load_flat_index,
        save_flat_index,
    )
    from python_cdc_spark.operators.pq import pq_encode

    params = {"kind": "pq", "m": _PQ_M, "k": _PQ_K, "iters": _PQ_ITERS, "exact": exact}
    fp = _emb_fingerprint(sf_dir)
    d = _index_dir(sf_dir, "pq", exact)
    if not index_is_current(d, fp, params):
        e = table(spark, sf_dir, "embeddings")
        book = _pq_codebook(spark, sf_dir, exact)
        codes = pq_encode(e, book, "vec_id", "embedding", m=_PQ_M, dims=_DIMS, exact=exact)
        save_flat_index(d, book, codes, fingerprint=fp, params=params)
    idx = load_flat_index(spark, d)
    return idx["codebook"], idx["codes"]


def _rq_index(
    spark: SparkSession, sf_dir: str, exact: bool
) -> tuple[DataFrame, DataFrame]:
    """(codebook, codes) for the two-stage RQ scan — persisted flat
    layout; the codebook carries the stage column, the codes carry
    (code1, code2)."""
    from python_cdc_spark.operators.ann_index import (
        index_is_current,
        load_flat_index,
        save_flat_index,
    )
    from python_cdc_spark.operators.pq import rq_encode

    params = {"kind": "rq", "m": _RQ_M, "k": _RQ_K, "iters": _RQ_ITERS, "exact": exact}
    fp = _emb_fingerprint(sf_dir)
    d = _index_dir(sf_dir, "rq", exact)
    if not index_is_current(d, fp, params):
        e = table(spark, sf_dir, "embeddings")
        book = _rq_codebook(spark, sf_dir, exact)
        codes = rq_encode(e, book, "vec_id", "embedding", m=_RQ_M, dims=_DIMS, exact=exact)
        save_flat_index(d, book, codes, fingerprint=fp, params=params)
    idx = load_flat_index(spark, d)
    return idx["codebook"], idx["codes"]


def _ivfpq_index_dir(spark: SparkSession, sf_dir: str, exact: bool) -> str:
    """Ensure a current persisted IVF-PQ index exists; return its dir.
    The cells table is Hive-partitioned by coarse cell, so probe-time
    reads prune whole directories (see operators/ann_index.py)."""
    from python_cdc_spark.operators.ann_index import (
        index_is_current,
        needs_refit,
        save_ivfpq_index,
    )
    from python_cdc_spark.operators.pq import pq_encode
    from python_cdc_spark.operators.similarity import kmeans_assign

    params = {
        "kind": "ivfpq", "ivf_k": _IVF_K, "ivf_iters": _IVF_ITERS,
        "m": _PQ_M, "k": _PQ_K, "iters": _PQ_ITERS, "exact": exact,
    }
    fp = _emb_fingerprint(sf_dir)
    d = _index_dir(sf_dir, "ivfpq", exact)
    # drift guard: an index that grew past the appended-fraction
    # threshold via frozen-quantizer appends re-fits here even if its
    # source fingerprint still matches
    if not index_is_current(d, fp, params) or needs_refit(d):
        e = table(spark, sf_dir, "embeddings")
        cent = _fitted_centroids(spark, sf_dir, exact)
        book = _pq_codebook(spark, sf_dir, exact)
        assigned = kmeans_assign(e, cent, "vec_id", "embedding", exact=exact).select(
            F.col("vec_id").alias("neighbor_id"), "cell"
        )
        codes = pq_encode(e, book, "vec_id", "embedding", m=_PQ_M, dims=_DIMS, exact=exact)
        save_ivfpq_index(
            d, cent, assigned, codes, book,
            fingerprint=fp, params=params,
        )
    return d


def _ivf_index_dir(spark: SparkSession, sf_dir: str, exact: bool) -> str:
    """Ensure a current persisted plain-IVF index exists; return its
    dir — the same build-once/query-many contract as the PQ/RQ/IVF-PQ/
    IVF-RQ indexes (r12): coarse centroids + cell-partitioned inverted
    lists, so probe-time reads prune whole cell directories. Before r13
    the plain-IVF query was the one ANN family member still paying
    corpus-scale work per invocation (re-assigning every corpus vector
    to its cell: O(N·k) distance math per query batch)."""
    from python_cdc_spark.operators.ann_index import (
        index_is_current,
        needs_refit,
        save_ivf_index,
    )
    from python_cdc_spark.operators.similarity import kmeans_assign

    params = {"kind": "ivf", "k": _IVF_K, "iters": _IVF_ITERS, "exact": exact}
    fp = _emb_fingerprint(sf_dir)
    d = _index_dir(sf_dir, "ivf", exact)
    if not index_is_current(d, fp, params) or needs_refit(d):
        e = table(spark, sf_dir, "embeddings")
        cent = _fitted_centroids(spark, sf_dir, exact)
        assigned = kmeans_assign(e, cent, "vec_id", "embedding", exact=exact).select(
            F.col("vec_id").alias("neighbor_id"), "cell"
        )
        save_ivf_index(d, cent, assigned, fingerprint=fp, params=params)
    return d


_PQ_BOOK_CACHE: dict[tuple, list] = {}


def _pq_codebook(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    """PQ index-build step, cached like the IVF centroids: the collected
    codebook is m×k rows of (dims/m)-double codewords — metadata-scale
    — and the fit is deterministic (md5-seeded k-means), so the cache
    is value-stable across sessions."""
    from python_cdc_spark.operators.pq import pq_fit

    key = (sf_dir, exact, _PQ_M, _PQ_K, _PQ_ITERS)
    if key not in _PQ_BOOK_CACHE:
        e = table(spark, sf_dir, "embeddings")
        book = pq_fit(
            e, "vec_id", "embedding",
            m=_PQ_M, dims=_DIMS, k=_PQ_K, iters=_PQ_ITERS, exact=exact,
        )
        _PQ_BOOK_CACHE[key] = sorted(
            (int(r["sub"]), int(r["cell"]), [float(x) for x in r["cvec"]])
            for r in book.collect()
        )
    from python_cdc_spark.functions.literals import literal_df

    return literal_df(
        spark, _PQ_BOOK_CACHE[key],
        [("sub", "int"), ("cell", "int"), ("cvec", "array<double>")],
    )


def _pq_topk(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    codes: DataFrame | None = None,
) -> DataFrame:
    from python_cdc_spark.operators.pq import pq_adc_topk

    e = table(spark, sf_dir, "embeddings")
    if codes is None:
        # load the persisted PQ index (codebook + codes), fitting only
        # on miss — the query path reads a prebuilt structure; callers
        # with their own prebuilt codes pass them in
        book, codes = _pq_index(spark, sf_dir, exact)
    else:
        book = _pq_codebook(spark, sf_dir, exact)
    queries = e.filter(F.col("vec_id") % 100 == 0)
    out = pq_adc_topk(
        e, codes, book, queries, "vec_id", "embedding",
        k_top=_TOPK, shortlist=_PQ_SHORTLIST, m=_PQ_M, dims=_DIMS, exact=exact,
    )
    return out.withColumnRenamed("rank", "rnk")


_RQ_M, _RQ_K, _RQ_ITERS, _RQ_SHORTLIST = 8, 16, 2, 128


def _sql_rq_oracle(m: int, k: int, iters: int, shortlist: int, topk: int, dims: int) -> str:
    """DuckDB replay of residual quantization end-to-end: per subspace a
    stage-1 k-means fit (identical Lloyd machinery to the PQ oracle),
    the residual computation (sub-vector minus its stage-1 codeword,
    double-widened exactly as Spark's ``zip_with``), a stage-2 fit over
    the residuals, two-code encoding, the two-stage ADC lookup-table
    scan (pdot = dot(q,c1)+dot(q,c2), norm² = |c1+c2|², all
    decimal-routed), the shortlist, and the exact re-rank."""
    from python_cdc_spark.functions.vectors import (
        sql_dec_dot_terms,
        sql_dec_sum_sq_terms,
    )

    d = dims // m

    def score(vec: str, cent: str) -> str:
        return f"{sql_dec_dot(vec, cent, d)} / {sql_dec_norm(cent, d)}"

    cell_of = (
        "CAST((  (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16"
        "      + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1)"
        f"     ) % {k} AS INTEGER)"
    )

    def assign(src: str, cent: str) -> str:
        return f"""
      SELECT vec_id, subv, cell FROM (
        SELECT e.vec_id, e.subv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score('e.subv', 'c.cvec')} DESC, c.cell) AS arnk
        FROM {src} e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """

    def lloyd(prefix: str, src: str) -> list[str]:
        """CTEs for one full fit over ``src`` (vec_id, subv): init +
        ``iters`` Lloyd rounds + the final assignment ``{prefix}F``."""
        out = [
            f"""{prefix}0 AS MATERIALIZED (
      SELECT {cell_of} AS cell,
             min_by(subv, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM {src} GROUP BY 1
    )"""
        ]
        for it in range(1, iters + 1):
            out.append(f"{prefix}a{it} AS MATERIALIZED ({assign(src, f'{prefix}{it - 1}')})")
            out.append(
                f"""{prefix}d{it} AS MATERIALIZED (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.subv[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM {prefix}a{it} a, UNNEST(generate_series(1, {d})) p(i)
      GROUP BY cell, p.i
    )"""
            )
            out.append(
                f"{prefix}{it} AS MATERIALIZED (SELECT cell, list(cval ORDER BY pos) AS cvec FROM {prefix}d{it} GROUP BY cell)"
            )
        out.append(f"{prefix}F AS MATERIALIZED ({assign(src, f'{prefix}{iters}')})")
        return out

    ctes = []
    for s in range(m):
        lo = s * d
        ctes.append(
            f"sub{s} AS (SELECT vec_id, list_slice(embedding, {lo + 1}, {lo + d}) AS subv FROM embeddings)"
        )
        ctes.extend(lloyd(f"c{s}_", f"sub{s}"))
        # residual: double-widened subtraction, exactly Spark's zip_with
        ctes.append(
            f"""res{s} AS MATERIALIZED (
      SELECT a.vec_id, list(CAST(a.subv[p.i] AS DOUBLE) - c.cvec[p.i] ORDER BY p.i) AS subv
      FROM c{s}_F a JOIN c{s}_{iters} c ON c.cell = a.cell,
           UNNEST(generate_series(1, {d})) p(i)
      GROUP BY a.vec_id
    )"""
        )
        ctes.extend(lloyd(f"r{s}_", f"res{s}"))
        ctes.append(
            f"qsub{s} AS (SELECT vec_id, subv FROM sub{s} WHERE vec_id % 100 = 0)"
        )
        ctes.append(
            f"""pair{s} AS MATERIALIZED (
      SELECT c1.cell AS code1, c2.cell AS code2, c1.cvec AS v1, c2.cvec AS v2,
             {sql_dec_sum_sq_terms('c1.cvec', 'c2.cvec', d)} AS n2p
      FROM c{s}_{iters} c1 CROSS JOIN r{s}_{iters} c2
    )"""
        )
    ctes.append(
        "codes AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT a1.vec_id, {s} AS sub, a1.cell AS code1, a2.cell AS code2 "
            f"FROM c{s}_F a1 JOIN r{s}_F a2 USING (vec_id)"
            for s in range(m)
        )
        + ")"
    )
    ctes.append(
        "lut AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT q.vec_id AS query_id, {s} AS sub, p.code1, p.code2, "
            f"({sql_dec_dot_terms('q.subv', 'p.v1', d)} + {sql_dec_dot_terms('q.subv', 'p.v2', d)}) AS pdot, "
            f"p.n2p "
            f"FROM qsub{s} q CROSS JOIN pair{s} p"
            for s in range(m)
        )
        + ")"
    )
    ctes.append(
        """scored AS MATERIALIZED (
      SELECT l.query_id, c.vec_id AS neighbor_id,
             CAST(ROUND(SUM(l.pdot), 6) AS DOUBLE) AS qdot,
             CAST(ROUND(SUM(l.n2p), 6) AS DOUBLE) AS n2
      FROM codes c JOIN lut l ON l.sub = c.sub AND l.code1 = c.code1 AND l.code2 = c.code2
      WHERE c.vec_id <> l.query_id
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""shortl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY qdot / sqrt(n2) DESC, neighbor_id) AS srnk
        FROM scored
      ) WHERE srnk <= {shortlist}
    )"""
    )
    ctes.append(
        f"nrms AS (SELECT vec_id, {sql_dec_norm('embedding', dims)} AS nrm FROM embeddings)"
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT s.query_id, s.neighbor_id,
             {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
                    {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
                    DESC, s.neighbor_id) AS BIGINT) AS rnk
      FROM shortl s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings e ON e.vec_id = s.neighbor_id
      JOIN nrms nq ON nq.vec_id = s.query_id
      JOIN nrms ne ON ne.vec_id = s.neighbor_id
    ) WHERE rnk <= {topk}
    """


@register(
    "similarity_rq_topk",
    oracle=_sql_rq_oracle(_RQ_M, _RQ_K, _RQ_ITERS, _RQ_SHORTLIST, _TOPK, _DIMS),
    doc=f"E26: residual-quantization ANN — m={_RQ_M} subspaces × 2 stages "
    f"(k={_RQ_K} each), two-code ADC scan, shortlist={_RQ_SHORTLIST}, "
    "exact re-rank; recall@5 ≥ 0.9 vs brute force at sf0.1",
)
def similarity_rq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RQ ANN: each vector carries 2m 4-bit codes (8 B at m=8 — 64×
    compression); the stage-2 residual codebooks double ADC fidelity at
    the same codebook size, lifting codes-only shortlist recall@5 from
    0.74 (single-stage, same bits-per-stage) to ≥0.9 measured vs brute
    force at sf0.1 (tests/test_operators.py::test_rq_adc_recall). The
    scan touches only the codes table (~1.6% of corpus bytes); true
    vectors are read for the 128-id-per-query re-rank only."""
    return _rq_topk(spark, sf_dir, exact=True)


def rq_topk_fast(
    spark: SparkSession, sf_dir: str, codes: DataFrame | None = None
) -> DataFrame:
    """Bench/scale variant: identical pipeline, double math (decimal
    routing exists only for oracle hashing); a caller amortizing index
    build across queries passes pre-materialized codes."""
    return _rq_topk(spark, sf_dir, exact=False, codes=codes)


_RQ_BOOK_CACHE: dict[tuple, list] = {}


def _rq_codebook(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    """RQ index-build step, cached like the PQ codebook: m×2×k rows of
    (dims/m)-double codewords — metadata-scale, deterministic fit."""
    from python_cdc_spark.operators.pq import rq_fit

    key = (sf_dir, exact, _RQ_M, _RQ_K, _RQ_ITERS)
    if key not in _RQ_BOOK_CACHE:
        e = table(spark, sf_dir, "embeddings")
        book = rq_fit(
            e, "vec_id", "embedding",
            m=_RQ_M, dims=_DIMS, k=_RQ_K, iters=_RQ_ITERS, exact=exact,
        )
        _RQ_BOOK_CACHE[key] = sorted(
            (int(r["sub"]), int(r["stage"]), int(r["cell"]), [float(x) for x in r["cvec"]])
            for r in book.collect()
        )
    from python_cdc_spark.functions.literals import literal_df

    return literal_df(
        spark, _RQ_BOOK_CACHE[key],
        [("sub", "int"), ("stage", "int"), ("cell", "int"), ("cvec", "array<double>")],
    )


def _rq_topk(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    codes: DataFrame | None = None,
) -> DataFrame:
    from python_cdc_spark.operators.pq import rq_adc_topk

    e = table(spark, sf_dir, "embeddings")
    if codes is None:
        # persisted RQ index: load when current, fit on miss
        book, codes = _rq_index(spark, sf_dir, exact)
    else:
        book = _rq_codebook(spark, sf_dir, exact)
    queries = e.filter(F.col("vec_id") % 100 == 0)
    out = rq_adc_topk(
        e, codes, book, queries, "vec_id", "embedding",
        k_top=_TOPK, shortlist=_RQ_SHORTLIST, m=_RQ_M, dims=_DIMS, exact=exact,
    )
    return out.withColumnRenamed("rank", "rnk")


def _ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    assigned: DataFrame | None = None,
) -> DataFrame:
    from python_cdc_spark.operators.similarity import kmeans_assign

    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    if assigned is None:
        # persisted inverted lists: load when current, fit on miss —
        # the other four ANN gates' amortized-build contract (r12),
        # extended to plain IVF (r13). Probe cells are collected (a
        # bounded |Q|·nprobe id list) and pushed as a partition filter
        # so the read prunes whole cell directories; before this the
        # query re-assigned the FULL corpus per invocation (O(N·k)
        # distance math for an O(N·nprobe/k) search).
        from python_cdc_spark.operators.ann_index import load_ivf_index

        idx = load_ivf_index(spark, _ivf_index_dir(spark, sf_dir, exact))
        probes = (
            kmeans_assign(
                queries, idx["centroids"], "vec_id", "embedding",
                exact=exact, n_best=_NPROBE,
            )
            .select(F.col("vec_id").alias("query_id"), "cell")
            # feeds the touched-cell collect AND the candidate join —
            # checkpoint so the assignment job runs once
            .localCheckpoint()
        )
        touched = sorted(
            {int(r["cell"]) for r in probes.select("cell").distinct().collect()}
        )
        assigned = idx["cells"].filter(F.col("cell").isin(touched))
    else:
        # callers amortizing the build in-session (bench fast variants)
        # pass the inverted lists directly
        cent = _fitted_centroids(spark, sf_dir, exact)
        probes = kmeans_assign(
            queries, cent, "vec_id", "embedding", exact=exact, n_best=_NPROBE
        ).select(F.col("vec_id").alias("query_id"), "cell")
    # candidate generation: probes are the bounded query working set ×
    # nprobe — broadcast them so the corpus-size inverted lists never
    # shuffle (was an SMJ sorting both sides on a k-value key)
    cand = (
        broadcast(probes).join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _rerank_topk(e, cand, exact=exact)


_IVFPQ_NPROBE, _IVFPQ_SHORTLIST = 8, 128


def _sql_ivfpq_oracle(
    coarse_k: int, coarse_iters: int, nprobe: int,
    m: int, k: int, iters: int, shortlist: int, topk: int, dims: int,
) -> str:
    """DuckDB replay of the IVF-PQ composite: the coarse Lloyd fit +
    query multi-probe + inverted-list candidates (identical machinery to
    the IVF oracle), the m sub-space PQ fits + encoding + ADC lookup
    tables (identical to the PQ oracle), with the ADC scan restricted to
    the candidate pairs, then shortlist + exact re-rank. All reductions
    decimal-routed; heavy CTEs MATERIALIZED (the composite references
    the coarse/code chains repeatedly and binder inlining explodes)."""
    from python_cdc_spark.functions.vectors import sql_dec_dot_terms

    d = dims // m

    def score(vec: str, cent: str, nd: int) -> str:
        return f"{sql_dec_dot(vec, cent, nd)} / {sql_dec_norm(cent, nd)}"

    def cell_of(n: int) -> str:
        return (
            "CAST((  (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16"
            "      + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1)"
            f"     ) % {n} AS INTEGER)"
        )

    ctes = []
    # ---- coarse quantizer over the full vectors (dims) ----
    coarse_assign = """
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score} DESC, c.cell) AS arnk
        FROM embeddings e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """
    ctes.append(
        f"""g0 AS MATERIALIZED (
      SELECT {cell_of(coarse_k)} AS cell,
             min_by(embedding, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM embeddings GROUP BY 1
    )"""
    )
    for it in range(1, coarse_iters + 1):
        ctes.append(
            f"ga{it} AS MATERIALIZED ({coarse_assign.format(score=score('e.embedding', 'c.cvec', dims), cent=f'g{it - 1}')})"
        )
        ctes.append(
            f"""gd{it} AS MATERIALIZED (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.embedding[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM ga{it} a, UNNEST(generate_series(1, {dims})) p(i)
      GROUP BY cell, p.i
    )"""
        )
        ctes.append(
            f"g{it} AS MATERIALIZED (SELECT cell, list(cval ORDER BY pos) AS cvec FROM gd{it} GROUP BY cell)"
        )
    ctes.append(
        f"gF AS MATERIALIZED ({coarse_assign.format(score=score('e.embedding', 'c.cvec', dims), cent=f'g{coarse_iters}')})"
    )
    ctes.append(
        f"""probe AS MATERIALIZED (
      SELECT query_id, cell FROM (
        SELECT e.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score('e.embedding', 'c.cvec', dims)} DESC, c.cell) AS prnk
        FROM embeddings e CROSS JOIN g{coarse_iters} c
        WHERE e.vec_id % 100 = 0
      ) WHERE prnk <= {nprobe}
    )"""
    )
    ctes.append(
        """cand AS MATERIALIZED (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN gF a ON a.cell = p.cell AND a.vec_id <> p.query_id
    )"""
    )
    # ---- PQ sub-space fits + codes + LUT (same machinery as PQ oracle) ----
    sub_assign = """
      SELECT vec_id, subv, cell FROM (
        SELECT e.vec_id, e.subv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score} DESC, c.cell) AS arnk
        FROM sub{s} e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """
    for s in range(m):
        lo = s * d
        ctes.append(
            f"sub{s} AS MATERIALIZED (SELECT vec_id, list_slice(embedding, {lo + 1}, {lo + d}) AS subv FROM embeddings)"
        )
        ctes.append(
            f"""p{s}_0 AS MATERIALIZED (
      SELECT {cell_of(k)} AS cell,
             min_by(subv, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM sub{s} GROUP BY 1
    )"""
        )
        for it in range(1, iters + 1):
            ctes.append(
                f"p{s}_a{it} AS MATERIALIZED ({sub_assign.format(score=score('e.subv', 'c.cvec', d), s=s, cent=f'p{s}_{it - 1}')})"
            )
            ctes.append(
                f"""p{s}_d{it} AS MATERIALIZED (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.subv[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM p{s}_a{it} a, UNNEST(generate_series(1, {d})) p(i)
      GROUP BY cell, p.i
    )"""
            )
            ctes.append(
                f"p{s}_{it} AS MATERIALIZED (SELECT cell, list(cval ORDER BY pos) AS cvec FROM p{s}_d{it} GROUP BY cell)"
            )
        ctes.append(
            f"p{s}_F AS MATERIALIZED ({sub_assign.format(score=score('e.subv', 'c.cvec', d), s=s, cent=f'p{s}_{iters}')})"
        )
        ctes.append(
            f"qsub{s} AS (SELECT vec_id, subv FROM sub{s} WHERE vec_id % 100 = 0)"
        )
    ctes.append(
        "codes AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {s} AS sub, cell AS code FROM p{s}_F" for s in range(m)
        )
        + ")"
    )
    ctes.append(
        "lut AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT q.vec_id AS query_id, {s} AS sub, c.cell AS code, "
            f"{sql_dec_dot_terms('q.subv', 'c.cvec', d)} AS pdot, "
            f"{sql_dec_dot_terms('c.cvec', 'c.cvec', d)} AS cn2 "
            f"FROM qsub{s} q CROSS JOIN p{s}_{iters} c"
            for s in range(m)
        )
        + ")"
    )
    ctes.append(
        """scored AS MATERIALIZED (
      SELECT n.query_id, n.neighbor_id,
             CAST(ROUND(SUM(l.pdot), 6) AS DOUBLE) AS qdot,
             CAST(ROUND(SUM(l.cn2), 6) AS DOUBLE) AS n2
      FROM cand n
      JOIN codes c ON c.vec_id = n.neighbor_id
      JOIN lut l ON l.query_id = n.query_id AND l.sub = c.sub AND l.code = c.code
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""shortl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY qdot / sqrt(n2) DESC, neighbor_id) AS srnk
        FROM scored
      ) WHERE srnk <= {shortlist}
    )"""
    )
    ctes.append(
        f"nrms AS (SELECT vec_id, {sql_dec_norm('embedding', dims)} AS nrm FROM embeddings)"
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT s.query_id, s.neighbor_id,
             {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
                    {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
                    DESC, s.neighbor_id) AS BIGINT) AS rnk
      FROM shortl s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings e ON e.vec_id = s.neighbor_id
      JOIN nrms nq ON nq.vec_id = s.query_id
      JOIN nrms ne ON ne.vec_id = s.neighbor_id
    ) WHERE rnk <= {topk}
    """


@register(
    "similarity_ivfpq_topk",
    oracle=_sql_ivfpq_oracle(
        _IVF_K, _IVF_ITERS, _IVFPQ_NPROBE,
        _PQ_M, _PQ_K, _PQ_ITERS, _IVFPQ_SHORTLIST, _TOPK, _DIMS,
    ),
    doc=f"E26: IVF-PQ composite ANN — coarse k={_IVF_K} quantizer bounds "
    f"WHICH rows (nprobe={_IVFPQ_NPROBE} inverted lists), PQ m={_PQ_M} "
    f"codes bound WHAT is read (ADC), shortlist={_IVFPQ_SHORTLIST} exact re-rank",
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard trillion-vector composite: IVF inverted lists bound
    the candidate set (nprobe/k of the corpus), PQ codes bound the bytes
    read for it (1 B per subspace), exact re-rank reads true vectors for
    the shortlist only. Shares the cached IVF centroids and PQ codebook
    with the standalone queries (one index, many access paths)."""
    return _ivfpq_topk(spark, sf_dir, exact=True)


def ivfpq_topk_fast(
    spark: SparkSession,
    sf_dir: str,
    assigned: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Bench/scale variant: double math; amortizing callers pass the
    prebuilt inverted lists + codes."""
    return _ivfpq_topk(spark, sf_dir, exact=False, assigned=assigned, codes=codes)


def _ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    exact: bool,
    assigned: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    from python_cdc_spark.operators.ann_index import ivf_pq_topk_from_index
    from python_cdc_spark.operators.pq import ivf_pq_topk

    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    if assigned is None and codes is None:
        # persisted IVF-PQ index: probe-time directory pruning on the
        # cell-partitioned cells table; fit-and-save on miss
        d = _ivfpq_index_dir(spark, sf_dir, exact)
        out = ivf_pq_topk_from_index(
            spark, e, d, queries, "vec_id", "embedding",
            k_top=_TOPK, nprobe=_IVFPQ_NPROBE, shortlist=_IVFPQ_SHORTLIST,
            m=_PQ_M, dims=_DIMS, exact=exact,
        )
        return out.withColumnRenamed("rank", "rnk")
    cent = _fitted_centroids(spark, sf_dir, exact)
    book = _pq_codebook(spark, sf_dir, exact)
    out = ivf_pq_topk(
        e, cent, assigned, codes, book, queries, "vec_id", "embedding",
        k_top=_TOPK, nprobe=_IVFPQ_NPROBE, shortlist=_IVFPQ_SHORTLIST,
        m=_PQ_M, dims=_DIMS, exact=exact,
    )
    return out.withColumnRenamed("rank", "rnk")


# IVF-RQ composite: finer coarse quantizer (k=64) probed WIDE
# (nprobe=40) — on this near-uniform corpus candidate recall, not code
# fidelity, is the ceiling (SCALE.md), and the 8 B/vector RQ codes make
# wide probing nearly free (codes scanned ≈ 62% of an 8-byte table =
# <1% of corpus bytes) while full-vector reads stay ≤ shortlist/N.
# Measured recall@5 vs brute force at sf0.1: 0.91 (floored at 0.85 in
# tests/test_operators.py) vs 0.45 for the PQ composite at ≤10% reads.
_IVFRQ_K, _IVFRQ_ITERS, _IVFRQ_NPROBE, _IVFRQ_SHORTLIST = 64, 3, 40, 128


def _sql_ivfrq_oracle(
    coarse_k: int, coarse_iters: int, nprobe: int,
    m: int, k: int, iters: int, shortlist: int, topk: int, dims: int,
) -> str:
    """DuckDB replay of the IVF-RQ composite: the coarse Lloyd fit +
    query multi-probe + inverted-list candidates (identical machinery to
    the IVF-PQ oracle), the per-subspace two-stage residual fits +
    two-code encoding + pair LUT (identical to the RQ oracle), with the
    ADC scan restricted to the candidate pairs, then shortlist + exact
    re-rank. All reductions decimal-routed; heavy CTEs MATERIALIZED."""
    from python_cdc_spark.functions.vectors import (
        sql_dec_dot_terms,
        sql_dec_sum_sq_terms,
    )

    d = dims // m

    def score(vec: str, cent: str, nd: int) -> str:
        return f"{sql_dec_dot(vec, cent, nd)} / {sql_dec_norm(cent, nd)}"

    def cell_of(n: int) -> str:
        return (
            "CAST((  (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16"
            "      + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1)"
            f"     ) % {n} AS INTEGER)"
        )

    ctes = []
    # ---- coarse quantizer over the full vectors (dims) ----
    coarse_assign = """
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score} DESC, c.cell) AS arnk
        FROM embeddings e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """
    ctes.append(
        f"""g0 AS MATERIALIZED (
      SELECT {cell_of(coarse_k)} AS cell,
             min_by(embedding, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM embeddings GROUP BY 1
    )"""
    )
    for it in range(1, coarse_iters + 1):
        ctes.append(
            f"ga{it} AS MATERIALIZED ({coarse_assign.format(score=score('e.embedding', 'c.cvec', dims), cent=f'g{it - 1}')})"
        )
        ctes.append(
            f"""gd{it} AS MATERIALIZED (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.embedding[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM ga{it} a, UNNEST(generate_series(1, {dims})) p(i)
      GROUP BY cell, p.i
    )"""
        )
        ctes.append(
            f"g{it} AS MATERIALIZED (SELECT cell, list(cval ORDER BY pos) AS cvec FROM gd{it} GROUP BY cell)"
        )
    ctes.append(
        f"gF AS MATERIALIZED ({coarse_assign.format(score=score('e.embedding', 'c.cvec', dims), cent=f'g{coarse_iters}')})"
    )
    ctes.append(
        f"""probe AS MATERIALIZED (
      SELECT query_id, cell FROM (
        SELECT e.vec_id AS query_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score('e.embedding', 'c.cvec', dims)} DESC, c.cell) AS prnk
        FROM embeddings e CROSS JOIN g{coarse_iters} c
        WHERE e.vec_id % 100 = 0
      ) WHERE prnk <= {nprobe}
    )"""
    )
    ctes.append(
        """cand AS MATERIALIZED (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN gF a ON a.cell = p.cell AND a.vec_id <> p.query_id
    )"""
    )

    # ---- per-subspace two-stage residual fits (RQ oracle machinery) ----
    def assign(src: str, cent: str) -> str:
        return f"""
      SELECT vec_id, subv, cell FROM (
        SELECT e.vec_id, e.subv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score('e.subv', 'c.cvec', d)} DESC, c.cell) AS arnk
        FROM {src} e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """

    def lloyd(prefix: str, src: str) -> list[str]:
        out = [
            f"""{prefix}0 AS MATERIALIZED (
      SELECT {cell_of(k)} AS cell,
             min_by(subv, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM {src} GROUP BY 1
    )"""
        ]
        for it in range(1, iters + 1):
            out.append(f"{prefix}a{it} AS MATERIALIZED ({assign(src, f'{prefix}{it - 1}')})")
            out.append(
                f"""{prefix}d{it} AS MATERIALIZED (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.subv[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM {prefix}a{it} a, UNNEST(generate_series(1, {d})) p(i)
      GROUP BY cell, p.i
    )"""
            )
            out.append(
                f"{prefix}{it} AS MATERIALIZED (SELECT cell, list(cval ORDER BY pos) AS cvec FROM {prefix}d{it} GROUP BY cell)"
            )
        out.append(f"{prefix}F AS MATERIALIZED ({assign(src, f'{prefix}{iters}')})")
        return out

    for s in range(m):
        lo = s * d
        ctes.append(
            f"sub{s} AS (SELECT vec_id, list_slice(embedding, {lo + 1}, {lo + d}) AS subv FROM embeddings)"
        )
        ctes.extend(lloyd(f"c{s}_", f"sub{s}"))
        ctes.append(
            f"""res{s} AS MATERIALIZED (
      SELECT a.vec_id, list(CAST(a.subv[p.i] AS DOUBLE) - c.cvec[p.i] ORDER BY p.i) AS subv
      FROM c{s}_F a JOIN c{s}_{iters} c ON c.cell = a.cell,
           UNNEST(generate_series(1, {d})) p(i)
      GROUP BY a.vec_id
    )"""
        )
        ctes.extend(lloyd(f"r{s}_", f"res{s}"))
        ctes.append(
            f"qsub{s} AS (SELECT vec_id, subv FROM sub{s} WHERE vec_id % 100 = 0)"
        )
        ctes.append(
            f"""pair{s} AS MATERIALIZED (
      SELECT c1.cell AS code1, c2.cell AS code2, c1.cvec AS v1, c2.cvec AS v2,
             {sql_dec_sum_sq_terms('c1.cvec', 'c2.cvec', d)} AS n2p
      FROM c{s}_{iters} c1 CROSS JOIN r{s}_{iters} c2
    )"""
        )
    ctes.append(
        "codes AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT a1.vec_id, {s} AS sub, a1.cell AS code1, a2.cell AS code2 "
            f"FROM c{s}_F a1 JOIN r{s}_F a2 USING (vec_id)"
            for s in range(m)
        )
        + ")"
    )
    ctes.append(
        "lut AS MATERIALIZED ("
        + " UNION ALL ".join(
            f"SELECT q.vec_id AS query_id, {s} AS sub, p.code1, p.code2, "
            f"({sql_dec_dot_terms('q.subv', 'p.v1', d)} + {sql_dec_dot_terms('q.subv', 'p.v2', d)}) AS pdot, "
            f"p.n2p "
            f"FROM qsub{s} q CROSS JOIN pair{s} p"
            for s in range(m)
        )
        + ")"
    )
    # candidate-restricted two-code ADC scan
    ctes.append(
        """scored AS MATERIALIZED (
      SELECT n.query_id, n.neighbor_id,
             CAST(ROUND(SUM(l.pdot), 6) AS DOUBLE) AS qdot,
             CAST(ROUND(SUM(l.n2p), 6) AS DOUBLE) AS n2
      FROM cand n
      JOIN codes c ON c.vec_id = n.neighbor_id
      JOIN lut l ON l.query_id = n.query_id AND l.sub = c.sub
                AND l.code1 = c.code1 AND l.code2 = c.code2
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""shortl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY qdot / sqrt(n2) DESC, neighbor_id) AS srnk
        FROM scored
      ) WHERE srnk <= {shortlist}
    )"""
    )
    ctes.append(
        f"nrms AS (SELECT vec_id, {sql_dec_norm('embedding', dims)} AS nrm FROM embeddings)"
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT query_id, neighbor_id, cosine, rnk FROM (
      SELECT s.query_id, s.neighbor_id,
             {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
                    {sql_dec_dot('q.embedding', 'e.embedding', dims)} / (nq.nrm * ne.nrm)
                    DESC, s.neighbor_id) AS BIGINT) AS rnk
      FROM shortl s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings e ON e.vec_id = s.neighbor_id
      JOIN nrms nq ON nq.vec_id = s.query_id
      JOIN nrms ne ON ne.vec_id = s.neighbor_id
    ) WHERE rnk <= {topk}
    """


@register(
    "similarity_ivfrq_topk",
    oracle=_sql_ivfrq_oracle(
        _IVFRQ_K, _IVFRQ_ITERS, _IVFRQ_NPROBE,
        _RQ_M, _RQ_K, _RQ_ITERS, _IVFRQ_SHORTLIST, _TOPK, _DIMS,
    ),
    doc=f"E26: IVF-RQ composite ANN — coarse k={_IVFRQ_K} probed wide "
    f"(nprobe={_IVFRQ_NPROBE}; 8 B/vector residual codes make wide probing "
    f"cheap), two-code ADC on candidates, shortlist={_IVFRQ_SHORTLIST} "
    "exact re-rank; recall@5 0.91 vs brute at sf0.1 (PQ composite: 0.45)",
)
def similarity_ivfrq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-lifted composite: IVF bounds WHICH rows, two-stage
    residual codes bound WHAT is read. Because RQ codes are 8 B/vector,
    probing 62% of cells scans <1% of corpus bytes — so the coarse
    quantizer's candidate-recall ceiling (the binding constraint on this
    near-uniform corpus, see SCALE.md) is lifted by probing wide while
    full-vector reads stay bounded by the shortlist. Uses the persisted
    cell-partitioned index (operators/ann_index.py), fit-on-miss."""
    return _ivfrq_topk(spark, sf_dir, exact=True)


def ivfrq_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench/scale variant: identical pipeline, double math."""
    return _ivfrq_topk(spark, sf_dir, exact=False)


def _ivfrq_index_dir(spark: SparkSession, sf_dir: str, exact: bool) -> str:
    """Ensure a current persisted IVF-RQ index exists; return its dir."""
    from python_cdc_spark.operators.ann_index import (
        index_is_current,
        save_ivfpq_index,
    )
    from python_cdc_spark.operators.pq import rq_encode
    from python_cdc_spark.operators.similarity import kmeans_assign

    params = {
        "kind": "ivfrq", "ivf_k": _IVFRQ_K, "ivf_iters": _IVFRQ_ITERS,
        "m": _RQ_M, "k": _RQ_K, "iters": _RQ_ITERS, "exact": exact,
    }
    fp = _emb_fingerprint(sf_dir)
    d = _index_dir(sf_dir, "ivfrq", exact)
    if not index_is_current(d, fp, params):
        e = table(spark, sf_dir, "embeddings")
        cent = _fitted_centroids(spark, sf_dir, exact, k=_IVFRQ_K, iters=_IVFRQ_ITERS)
        book = _rq_codebook(spark, sf_dir, exact)
        assigned = kmeans_assign(e, cent, "vec_id", "embedding", exact=exact).select(
            F.col("vec_id").alias("neighbor_id"), "cell"
        )
        codes = rq_encode(e, book, "vec_id", "embedding", m=_RQ_M, dims=_DIMS, exact=exact)
        save_ivfpq_index(
            d, cent, assigned, codes, book,
            fingerprint=fp, params=params,
        )
    return d


def _ivfrq_topk(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    from python_cdc_spark.operators.ann_index import ivf_rq_topk_from_index

    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 100 == 0)
    d = _ivfrq_index_dir(spark, sf_dir, exact)
    out = ivf_rq_topk_from_index(
        spark, e, d, queries, "vec_id", "embedding",
        k_top=_TOPK, nprobe=_IVFRQ_NPROBE, shortlist=_IVFRQ_SHORTLIST,
        m=_RQ_M, dims=_DIMS, exact=exact,
    )
    return out.withColumnRenamed("rank", "rnk")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): k-means the embedding
# space, then compare only WITHIN each cluster — the cluster pass turns
# the O(n²) all-pairs cosine into Σ cᵢ², with k chosen so cᵢ stays
# bounded (k grows with n at real scale; the fit cost is the same
# distributed Lloyd the IVF index already pays, and the cache shares it).


def _sql_full_lloyd_ctes(
    k: int, iters: int, dims: int,
    src: str = "embeddings", assign_src: str | None = None,
) -> list[str]:
    """CTE list replaying kmeans_fit + final assignment over the full
    64-dim embeddings in DuckDB: ``cent0``..``cent{iters}`` and
    ``assignF`` (vec_id, embedding, cell). Same init (min-md5 per
    two-hex-digit cell) and decimal-routed math as the Spark fit.
    MATERIALIZED throughout — each round references the previous CTE
    more than once and binder inlining would re-expand the chain.

    ``src`` is the relation the quantizer FITS on; ``assign_src`` is
    the relation ``assignF`` finally assigns (defaults to ``src``).
    They differ in the CDC-maintained index gate, where the fit is
    frozen on the pre-delta base but the assignment covers the
    post-apply corpus."""
    assign_src = assign_src or src

    def score(vec: str, cent: str) -> str:
        return f"{sql_dec_dot(vec, cent, dims)} / {sql_dec_norm(cent, dims)}"

    assign_body = """
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {score} DESC, c.cell) AS arnk
        FROM {src} e CROSS JOIN {cent} c
      ) WHERE arnk = 1
    """
    ctes = [
        f"""cent0 AS MATERIALIZED (
      SELECT CAST((  (strpos('0123456789abcdef',
                             substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef',
                             substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1)
                  ) % {k} AS INTEGER) AS cell,
             min_by(embedding, md5(CAST(vec_id AS VARCHAR))) AS cvec
      FROM {src} GROUP BY 1
    )""",
    ]
    for it in range(1, iters + 1):
        ctes.append(
            f"assign{it} AS MATERIALIZED ({assign_body.format(score=score('e.embedding', 'c.cvec'), cent=f'cent{it - 1}', src=src)})"
        )
        ctes.append(
            f"""cd{it} AS MATERIALIZED (
      SELECT cell, p.i AS pos,
             CAST(ROUND(SUM(CAST(CAST(a.embedding[p.i] AS DOUBLE)
                 AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(*) AS cval
      FROM assign{it} a, UNNEST(generate_series(1, {dims})) p(i)
      GROUP BY cell, p.i
    )"""
        )
        ctes.append(
            f"cent{it} AS MATERIALIZED (SELECT cell, list(cval ORDER BY pos) AS cvec FROM cd{it} GROUP BY cell)"
        )
    ctes.append(
        f"assignF AS MATERIALIZED ({assign_body.format(score=score('e.embedding', 'c.cvec'), cent=f'cent{iters}', src=assign_src)})"
    )
    return ctes


_SEM_K, _SEM_ITERS, _SEM_TAU = 64, 3, 0.25


def _sql_semdedup_oracle(k: int, iters: int, tau: float, dims: int) -> str:
    ctes = _sql_full_lloyd_ctes(k, iters, dims)
    ctes.append(
        f"nrms AS MATERIALIZED (SELECT vec_id, {sql_dec_norm('embedding', dims)} AS nrm FROM embeddings)"
    )
    ctes.append(
        f"""pairs AS (
      SELECT b.vec_id AS vec_id,
             {sql_dec_dot('a.embedding', 'b.embedding', dims)} / (na.nrm * nb.nrm)
               AS cos
      FROM assignF a
      JOIN assignF b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN nrms na ON na.vec_id = a.vec_id
      JOIN nrms nb ON nb.vec_id = b.vec_id
    )"""
    )
    ctes.append(
        "sim AS (SELECT vec_id, MAX(cos) AS max_sim_prev FROM pairs GROUP BY 1)"
    )
    return f"""
    WITH {','.join(ctes)}
    SELECT f.vec_id, f.cell, s.max_sim_prev,
           COALESCE(s.max_sim_prev >= {tau}, FALSE) AS is_dup
    FROM assignF f LEFT JOIN sim s USING (vec_id)
    """


@register(
    "dedup_semantic_clusters",
    oracle=_sql_semdedup_oracle(_SEM_K, _SEM_ITERS, _SEM_TAU, _DIMS),
    doc=f"E26: semantic dedup (SemDeDup) — k-means cluster pass "
    f"(k={_SEM_K}) then within-cluster cosine; a vector is a dup when a "
    f"smaller-id cluster-mate is within tau={_SEM_TAU}",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: embeddings are clustered with the shared distributed
    k-means (same fit+cache the IVF index uses), then cosine runs ONLY
    within clusters — pair count is Σ cᵢ² instead of n², and the keep
    rule (survivor = lowest vec_id among mutual near-dups) is a pure
    per-pair predicate, no iterative closure.

    Scale: the fit is the amortized IVF quantizer; the self-join
    shuffles on cell (cluster id), so each cluster's pairs materialize
    on one executor — bound cᵢ by raising k with n (SemDeDup's own
    recipe) or salting oversized cells into sub-blocks. max_sim_prev is
    a MAX over doubles: order-independent, engine-exact."""
    return _semdedup(spark, sf_dir, exact=True)


def semdedup_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench/scale variant: identical pipeline, double math (decimal
    routing exists only for oracle hashing)."""
    return _semdedup(spark, sf_dir, exact=False)


def _semdedup(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    from python_cdc_spark.operators.similarity import kmeans_assign

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = _fitted_centroids(spark, sf_dir, exact=exact, k=_SEM_K, iters=_SEM_ITERS)
    assigned = kmeans_assign(
        e, cent, "vec_id", "embedding", exact=exact, dims=_DIMS
    ).localCheckpoint(eager=False)
    norms = e.select(
        "vec_id", l2_norm(F.col("embedding"), exact=exact).alias("nrm")
    )
    a = (
        assigned.join(norms, "vec_id")
        .select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("va"),
            F.col("nrm").alias("na"),
            "cell",
        )
    )
    b = (
        assigned.join(norms, "vec_id")
        .select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vb"),
            F.col("nrm").alias("nb"),
            F.col("cell").alias("cell_b"),
        )
    )
    if exact:
        dot = dec_dot_product(F.col("va"), F.col("vb"))
    else:
        from python_cdc_spark.functions.vectors import dot_expr

        dot = dot_expr("va", "vb", _DIMS)
    cos = dot / (F.col("na") * F.col("nb"))
    sim = (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b")))
        .select(F.col("id_b").alias("vec_id"), cos.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_sim_prev"))
    )
    return (
        assigned.select("vec_id", "cell")
        .join(sim, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "max_sim_prev",
            F.coalesce(F.col("max_sim_prev") >= _SEM_TAU, F.lit(False)).alias(
                "is_dup"
            ),
        )
    )


# ---------------------------------------------------------------------------
# CDC-maintained ANN index — the engine's two flagship halves integrated
# for the index the way plans/rollup.refresh_cdc integrates them for
# rollups (r6): a persisted cell-partitioned IVF index is MAINTAINED
# through an I/U/D vector delta touching only the affected cell
# directories, and the gate proves maintained == from-scratch rebuild
# on the post-apply corpus under the same frozen coarse quantizer.
# ---------------------------------------------------------------------------
_ACDC_K, _ACDC_ITERS = 16, 2


def _fitted_cdc_base_centroids(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Frozen coarse quantizer for the CDC-maintained index: fit on the
    PRE-DELTA base corpus (vec_id % 10 != 0) once per testdata round and
    cached like the IVF quantizer — maintenance folds place vectors with
    this frozen fit; re-fitting is the needs_refit escalation, not the
    per-delta path."""
    from python_cdc_spark.operators.similarity import _collect_centroids, kmeans_fit

    key = (sf_dir, "cdc_base", exact, _ACDC_K, _ACDC_ITERS)
    if key not in _IVF_CENT_CACHE:
        base = (
            table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 10 != 0)
            .select("vec_id", "embedding")
        )
        _IVF_CENT_CACHE[key] = _collect_centroids(
            kmeans_fit(
                base, "vec_id", "embedding",
                k=_ACDC_K, iters=_ACDC_ITERS, exact=exact, dims=_DIMS,
            )
        )
    from python_cdc_spark.functions.literals import literal_df

    return literal_df(
        spark, _IVF_CENT_CACHE[key], [("cell", "int"), ("cvec", "array<double>")]
    )


def _sql_ann_cdc_oracle(k: int, iters: int, dims: int) -> str:
    """From-scratch rebuild on the post-apply corpus: fit the quantizer
    on the pre-delta base (frozen, like the maintained side), assign the
    FINAL corpus (inserts in, deletes out, updates re-imaged), emit the
    index contents. Row-image status/head_val prove updates replaced the
    stored vector, not just membership."""
    ctes = _sql_full_lloyd_ctes(k, iters, dims, src="basec", assign_src="finalc")
    return f"""
    WITH basec AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0
    ),
    finalc AS MATERIALIZED (
      SELECT vec_id,
             CASE WHEN vec_id % 10 = 7 THEN list_reverse(embedding)
                  ELSE embedding END AS embedding
      FROM embeddings WHERE vec_id % 10 <> 3
    ),
    {','.join(ctes)}
    SELECT vec_id, CAST(cell AS INTEGER) AS cell,
           CAST(embedding[1] AS DOUBLE) AS head_val,
           CASE WHEN vec_id % 10 = 0 THEN 'inserted'
                WHEN vec_id % 10 = 7 THEN 'updated'
                ELSE 'base' END AS status
    FROM assignF
    """


@register(
    "ann_index_cdc_maintained",
    oracle=_sql_ann_cdc_oracle(_ACDC_K, _ACDC_ITERS, _DIMS),
    doc="FLAGSHIP INTEGRATION — CDC-maintained persistent ANN index: "
    "the cell-partitioned inverted lists (operators/ann_index.py) are "
    "maintained through an I/U/D vector delta — inserts/updates placed "
    "by the BROADCAST frozen coarse quantizer, deletes/updates evicted "
    "from their current cells, ONLY touched cell directories rewritten "
    "(dynamic partition overwrite; O(touched) like the apply store). "
    "The oracle rebuilds the index from scratch on the post-apply "
    "corpus under the same frozen quantizer, so the gate proves "
    "maintained == rebuild through inserts, re-imaged updates (row "
    "image AND cell migration), and deletes.",
)
def ann_index_cdc_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index counterpart of rollup_cdc_maintained: a persisted IVF
    index absorbs a CDC delta in O(touched cells), never O(index).

    Deterministic delta (derived from vec_id % 10, so both engines and
    every run agree): 0 → INSERT (held out of the base build), 3 →
    DELETE, 7 → UPDATE with the element-reversed vector (same values,
    different direction — the cell genuinely migrates and the stored
    row image changes). The maintenance fold: placement = one broadcast
    join against the k frozen centroids; eviction = column-pruned
    (neighbor_id, cell) scan against the broadcast victim ids; rewrite
    = touched cell dirs only. Drift counters advance so needs_refit
    still escalates to a true re-fit. Each invocation rebuilds the
    pristine base lists first (the meta marks a maintained tree), so
    the fold is exercised deterministically every run — same discipline
    as rollup_cdc_maintained."""
    return _ann_cdc_maintained(spark, sf_dir, exact=True)


def ann_cdc_maintained_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench/scale variant: identical build->fold->read pipeline, double
    math (decimal routing exists only for oracle hashing) and its own
    index directory."""
    return _ann_cdc_maintained(spark, sf_dir, exact=False)


def _ann_cdc_maintained(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    import hashlib

    from python_cdc_spark.operators.ann_index import (
        build_ivf_lists,
        ivf_lists_need_rebuild,
        maintain_ivf_lists_cdc,
        source_fingerprint,
    )

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    m = F.col("vec_id") % 10
    base = e.filter(m != 0)
    payload = {"head_val": F.col("embedding")[0].cast("double")}
    fp = source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    params = {"k": _ACDC_K, "iters": _ACDC_ITERS, "exact": exact}
    cache_key = hashlib.md5(
        os.path.abspath(sf_dir.rstrip("/")).encode()
    ).hexdigest()[:16]
    suffix = "_cdc_lists" if exact else "_cdc_lists_fast"
    idx_dir = os.path.join(".ann_index", cache_key + suffix)
    if ivf_lists_need_rebuild(idx_dir, fp, params):
        # the quantizer fit is build-only: the fold places with the
        # centroids persisted inside the index directory
        cent = _fitted_cdc_base_centroids(spark, sf_dir, exact=exact)
        build_ivf_lists(
            spark, idx_dir, base, cent,
            payload=payload, fingerprint=fp, params=params,
            exact=exact, dims=_DIMS,
        )
    delta = (
        e.filter(m == 0)
        .select(F.lit("I").alias("op"), "vec_id", "embedding")
        .unionByName(
            e.filter(m == 7).select(
                F.lit("U").alias("op"), "vec_id",
                F.reverse("embedding").alias("embedding"),
            )
        )
        .unionByName(
            e.filter(m == 3).select(F.lit("D").alias("op"), "vec_id", "embedding")
        )
    )
    # gate-cost separation (r10 verdict #3): the cached base lists stay
    # PRISTINE — the fold runs in a file-copy, so warm invocations pay
    # copy + fold + read (the production shape), never a rebuild
    import shutil
    import tempfile

    def _link_or_copy(src, dst):
        # hardlink tree: metadata-only fixture copy (see
        # helpers.cached_pristine_base for the immutability argument —
        # ANN folds unlink+rewrite partition files, never truncate
        # a shared inode in place)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)

    with tempfile.TemporaryDirectory() as tmp:
        work = os.path.join(tmp, "idx")
        shutil.copytree(idx_dir, work, copy_function=_link_or_copy)
        maintain_ivf_lists_cdc(
            spark, work, delta, payload=payload, exact=exact, dims=_DIMS
        )
        from python_cdc_spark.operators.ann_index import _read_index_table

        lists = _read_index_table(spark, work, "cells").localCheckpoint(
            eager=True
        )  # materialize before the dir vanishes
    mm = F.col("vec_id") % 10
    return lists.select(
        F.col("neighbor_id").cast("long").alias("vec_id"),
        F.col("cell").cast("int").alias("cell"),
        "head_val",
    ).withColumn(
        "status",
        F.when(mm == 0, F.lit("inserted"))
        .when(mm == 7, F.lit("updated"))
        .otherwise(F.lit("base")),
    )

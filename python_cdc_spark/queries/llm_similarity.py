"""Similarity-search + multimodal queries over embeddings (E26, E28).

Brute-force exact cosine is the correctness baseline; hyperplane-LSH
bucketing is the scale path (both oracle-checked — the LSH hyperplanes
are deterministic md5-parity constants shared with the SQL twin).
"""

from __future__ import annotations

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
    from python_cdc_spark.operators.similarity import hyperplane_lsh_tables

    e = table(spark, sf_dir, "embeddings")
    stacked = hyperplane_lsh_tables(e, "vec_id", "embedding", _TABLES, _PPT, _DIMS)
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
    # norms once per vector (not per pair) — same arithmetic as the
    # oracle's norm CTE, 3x less decimal work in the re-rank
    norms = e.select(
        "vec_id", l2_norm(F.col("embedding"), exact=True).alias("nrm")
    )
    qv = e.join(norms, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("q_nrm"),
    )
    ev = e.join(norms, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("c_nrm"),
    )
    cos = dec_dot_product(F.col("qv"), F.col("cv")) / (F.col("q_nrm") * F.col("c_nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        # both vector lookups broadcast: the candidate pair stream never
        # shuffles embeddings (at larger-than-memory corpus scale the
        # neighbor lookup becomes a bucket-co-partitioned join instead)
        cand.join(broadcast(qv), "query_id")
        .join(broadcast(ev), "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOPK)
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


_SQL_CENTROIDS = f"""
    cells AS (
      SELECT label, i.i AS pos, CAST(embedding[i.i] AS DOUBLE) AS val
      FROM embeddings, UNNEST(generate_series(1, {_DIMS})) i(i)
    ),
    cdims AS (
      SELECT label, pos,
             CAST(ROUND(SUM(CAST(val AS DECIMAL(30,12))), 6) AS DOUBLE) / COUNT(val)
               AS cval
      FROM cells GROUP BY label, pos
    ),
    centroids AS (
      SELECT label AS c_label, list(cval ORDER BY pos) AS cvec
      FROM cdims GROUP BY label
    )
"""


@register(
    "similarity_ivf_topk",
    oracle=f"""
    WITH {_SQL_CENTROIDS},
    q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0
    ),
    probe AS (
      SELECT query_id, qv, c_label FROM (
        SELECT q.query_id, q.qv, c.c_label,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {sql_dec_dot('q.qv', 'c.cvec', _DIMS)}
                          / ({sql_dec_norm('q.qv', _DIMS)} * {sql_dec_norm('c.cvec', _DIMS)})
                          DESC, c.c_label
               ) AS crnk
        FROM q CROSS JOIN centroids c
      ) WHERE crnk = 1
    )
    SELECT query_id, probed_label, neighbor_id, cosine, rnk FROM (
      SELECT p.query_id, p.c_label AS probed_label, e.vec_id AS neighbor_id,
             {sql_dec_dot('p.qv', 'e.embedding', _DIMS)}
               / ({sql_dec_norm('p.qv', _DIMS)} * {sql_dec_norm('e.embedding', _DIMS)})
               AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                    {sql_dec_dot('p.qv', 'e.embedding', _DIMS)}
                      / ({sql_dec_norm('p.qv', _DIMS)} * {sql_dec_norm('e.embedding', _DIMS)})
                    DESC, e.vec_id) AS BIGINT) AS rnk
      FROM probe p JOIN embeddings e
        ON e.label = p.c_label AND e.vec_id <> p.query_id
    ) WHERE rnk <= {_TOPK}
    """,
    doc="E26: IVF-style ANN — label as coarse quantizer, nprobe=1, "
    "exact re-rank within the probed cell",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted-file ANN shape: centroids per cluster label (the
    coarse quantizer a k-means pass would produce), each query probes
    its best centroid and exact-ranks only that cell — search cost
    drops from O(N) to O(N / n_cells) per query. Centroid means are
    decimal-routed so the oracle reproduces them bit-exactly."""
    from python_cdc_spark.functions.vectors import dec_dot_product, l2_norm

    e = table(spark, sf_dir, "embeddings")
    dec = "decimal(30,12)"
    cdims = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.round(F.sum(F.col("val").cast("double").cast(dec)), 6).cast("double")
                / F.count("val")
            ).alias("cval")
        )
    )
    centroids = cdims.groupBy(F.col("label").alias("c_label")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.getField("cval"),
        ).alias("cvec")
    )
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    ccos = dec_dot_product(F.col("qv"), F.col("cvec")) / (
        l2_norm(F.col("qv"), exact=True) * l2_norm(F.col("cvec"), exact=True)
    )
    wprobe = Window.partitionBy("query_id").orderBy(F.desc("__ccos"), F.asc("c_label"))
    probe = (
        q.crossJoin(broadcast(centroids))
        .withColumn("__ccos", ccos)
        .withColumn("crnk", F.row_number().over(wprobe))
        .filter(F.col("crnk") == 1)
        .select("query_id", "qv", F.col("c_label").alias("probed_label"))
    )
    ncos = dec_dot_product(F.col("qv"), F.col("embedding")) / (
        l2_norm(F.col("qv"), exact=True) * l2_norm(F.col("embedding"), exact=True)
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        e.join(
            broadcast(probe),
            (e.label == F.col("probed_label")) & (e.vec_id != F.col("query_id")),
        )
        .select(
            "query_id",
            "probed_label",
            F.col("vec_id").alias("neighbor_id"),
            ncos.alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rnk") <= _TOPK)
    )

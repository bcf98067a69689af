"""Distributed ML-training primitives (the MLlib pattern): models whose
fit reduces to ONE aggregation pass producing metadata-scale sufficient
statistics, solved on the driver.

Linear regression via normal equations is the canonical case: X'X is
(p+1)², X'y is p+1 — a handful of doubles regardless of corpus size —
and every entry is a SUM of per-row products, so the whole fit is one
map + one (decimal-routed, hence engine-exact) aggregate. This is how
a quality-classifier head actually gets (re)trained against a 100 TB
corpus: no per-row Python, no iterations over the data, one shuffle.

The registered query returns the statistics themselves (driver-
checkable against DuckDB bit-for-bit); the solve — a p×p numpy call —
is pinned by ``test_linreg_suffstats_solve`` which checks the closed-
form fit beats the mean baseline on its own training corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.functions.text import LANG_STOPWORDS, tokens
from python_cdc_spark.io import table
from python_cdc_spark.queries.llm_text import _SQL_STOPLIST, _SQL_TOKS
from python_cdc_spark.queries.registry import register

#: feature names; the target is log-ish scaled n_chars (sqrt keeps the
#: arithmetic inside correctly-rounded IEEE ops — no libm log)
_FEATS = [
    "intercept",
    "sqrt_tokens",
    "stopword_ratio",
    "mean_token_len",
    "type_token_ratio",
]


def _sql_feature_cte() -> str:
    return f"""
    SELECT doc_id,
           1.0 AS intercept,
           sqrt(CAST(len(w) AS DOUBLE)) AS sqrt_tokens,
           CAST(len(list_filter(w, x -> x IN ({_SQL_STOPLIST}))) AS DOUBLE)
             / len(w) AS stopword_ratio,
           CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
             AS mean_token_len,
           CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio,
           sqrt(CAST(length(text) AS DOUBLE)) AS y
    FROM (SELECT doc_id, text, {_SQL_TOKS} AS w FROM documents)
    """


def _sql_suffstats() -> str:
    entries = []
    for i, fi in enumerate(_FEATS):
        for j, fj in enumerate(_FEATS):
            if j < i:
                continue
            entries.append(
                f"SELECT 'xtx:{fi}:{fj}' AS stat, "
                f"CAST(ROUND(SUM(CAST({fi} * {fj} AS DECIMAL(30,10))), 4) AS DOUBLE)"
                f" AS value FROM f"
            )
    for fi in _FEATS:
        entries.append(
            f"SELECT 'xty:{fi}' AS stat, "
            f"CAST(ROUND(SUM(CAST({fi} * y AS DECIMAL(30,10))), 4) AS DOUBLE)"
            f" AS value FROM f"
        )
    entries.append("SELECT 'n' AS stat, CAST(COUNT(*) AS DOUBLE) AS value FROM f")
    entries.append(
        "SELECT 'yty' AS stat, "
        "CAST(ROUND(SUM(CAST(y * y AS DECIMAL(30,10))), 4) AS DOUBLE) AS value FROM f"
    )
    entries.append(
        "SELECT 'sy' AS stat, "
        "CAST(ROUND(SUM(CAST(y AS DECIMAL(30,10))), 4) AS DOUBLE) AS value FROM f"
    )
    return f"WITH f AS ({_sql_feature_cte()}) " + " UNION ALL ".join(entries)


@register(
    "ml_linreg_suffstats",
    oracle=_sql_suffstats(),
    doc="ML primitive: one-pass sufficient statistics (X'X upper "
    "triangle, X'y, n, y'y, sum y) for closed-form linear regression "
    "of sqrt(doc length) on text features — the distributed-training "
    "pattern where the fit is one aggregate and the solve is "
    "metadata-scale",
)
def ml_linreg_suffstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one aggregate row, unpivoted to (stat, value): the
    entire training pass for a linear model at any corpus size. Each
    sum is decimal-routed so Spark's partial-aggregation order and the
    DuckDB oracle agree bit-for-bit. The driver never sees rows — only
    the (p²+3p)/2+3 statistics."""
    # project the token array ONCE (three references, two via interpreted
    # HOF lambdas — same reasoning as word_ngrams_from_tokens, r13)
    d = table(spark, sf_dir, "documents").select(
        "text", tokens(F.col("text")).alias("__toks")
    )
    toks = F.col("__toks")
    n_tok = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(
            toks,
            lambda t: t.isin([s for v in LANG_STOPWORDS.values() for s in v]),
        )
    ).cast("double")
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    ).cast("double")
    f = d.select(
        F.lit(1.0).alias("intercept"),
        F.sqrt(n_tok).alias("sqrt_tokens"),
        (stop_hits / n_tok).alias("stopword_ratio"),
        (tok_chars / n_tok).alias("mean_token_len"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias(
            "type_token_ratio"
        ),
        F.sqrt(F.length("text").cast("double")).alias("y"),
    )

    def dsum(expr, name):
        return F.round(F.sum(expr.cast("decimal(30,10)")), 4).cast("double").alias(name)

    aggs, names = [], []
    for i, fi in enumerate(_FEATS):
        for j, fj in enumerate(_FEATS):
            if j < i:
                continue
            names.append(f"xtx:{fi}:{fj}")
            aggs.append(dsum(F.col(fi) * F.col(fj), f"a{len(names)}"))
    for fi in _FEATS:
        names.append(f"xty:{fi}")
        aggs.append(dsum(F.col(fi) * F.col("y"), f"a{len(names)}"))
    names.append("n")
    aggs.append(F.count(F.lit(1)).cast("double").alias(f"a{len(names)}"))
    names.append("yty")
    aggs.append(dsum(F.col("y") * F.col("y"), f"a{len(names)}"))
    names.append("sy")
    aggs.append(dsum(F.col("y"), f"a{len(names)}"))
    row = f.agg(*aggs)
    structs = [
        F.struct(F.lit(n).alias("stat"), F.col(f"a{i + 1}").alias("value"))
        for i, n in enumerate(names)
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# --- PCA: oracle-gated covariance block ------------------------------

#: leading dims whose covariance block the gate checks exactly; the
#: full-dim fit itself is operators/pca.py (one-pass partitioned
#: suffstats + driver eigh), pinned against full-data numpy by
#: tests/test_operators.py::test_pca_fit_matches_full_data_numpy
_COV_DIMS = 8


def _pca_cov_oracle() -> str:
    def el(i: int) -> str:
        return f"CAST(embedding[{i + 1}] AS DOUBLE)"

    def dsum(expr: str, alias: str) -> str:
        return (
            f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,10))), 4) AS DOUBLE)"
            f" AS {alias}"
        )

    cols = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for i in range(_COV_DIMS):
        cols.append(dsum(el(i), f"s{i}"))
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            cols.append(dsum(f"{el(i)} * {el(j)}", f"p{i}_{j}"))
    rows = [
        f"SELECT CAST({i} AS INTEGER) AS i, CAST({j} AS INTEGER) AS j, "
        f"p{i}_{j}/n - (s{i}/n)*(s{j}/n) AS cov FROM s"
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    ]
    return (
        "WITH s AS (SELECT "
        + ", ".join(cols)
        + " FROM embeddings) "
        + " UNION ALL ".join(rows)
    )


@register(
    "ml_pca_covariance_block",
    oracle=_pca_cov_oracle(),
    doc="PCA sufficient statistics, engine-exact: the 8x8 leading "
    "covariance block of the embedding corpus from ONE decimal-routed "
    "aggregation pass (36 upper-triangle entries) — the same "
    "suffstats-then-driver-solve shape operators/pca.py scales to all "
    "64 dims with per-partition numpy Gram accumulation",
)
def ml_pca_covariance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance needs Σx_i·x_j and Σx_i only, so the whole block is
    one map + one aggregate — no shuffle beyond the aggregation itself,
    no per-row explode (the naive (i,j)-explode inflates the corpus
    d²/2-fold before its shuffle). Sums are decimal-routed, hence
    order-independent and identical across engines; cov is then a pure
    double expression over identical operands. The full-rank fit path
    (all 64 dims, eigendecomposition, whitening projection) lives in
    ``operators/pca.py`` where the Gram matrix accumulates per
    partition in float64 BLAS — engine-exact gating of a dim block here
    plus numpy-pinned tests there, because bit-pinning a 64x64 float
    eigensolve across engines is not meaningful."""
    from python_cdc_spark.queries.helpers import dec_sum

    e = table(spark, sf_dir, "embeddings").select("embedding")

    def el(i: int):
        return F.element_at("embedding", i + 1).cast("double")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(_COV_DIMS):
        aggs.append(dec_sum(el(i), f"s{i}"))
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            aggs.append(dec_sum(el(i) * el(j), f"p{i}_{j}"))
    row = e.agg(*aggs)
    cells = [
        F.struct(
            F.lit(i).alias("i"),
            F.lit(j).alias("j"),
            (
                F.col(f"p{i}_{j}") / F.col("n")
                - (F.col(f"s{i}") / F.col("n")) * (F.col(f"s{j}") / F.col("n"))
            ).alias("cov"),
        )
        for i in range(_COV_DIMS)
        for j in range(i, _COV_DIMS)
    ]
    return row.select(F.explode(F.array(*cells)).alias("c")).select(
        "c.i", "c.j", "c.cov"
    )

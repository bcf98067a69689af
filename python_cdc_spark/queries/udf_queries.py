"""Oracle-checked UDF-surface queries (E29).

Round-1 left E29 verified only by unit tests; these two queries put the
Python-execution escape hatches under the driver's DuckDB gate:

- a Python UDTF (one row in → many rows out) driven through a SQL
  LATERAL join;
- an Arrow-batched scalar ``pandas_udf`` (the vectorized path that
  replaces row-at-a-time UDFs on anything hot).

Both produce exact values (strings / integers) so the oracle comparison
is bit-trivial — no float accumulation is involved. Tokenization here is
Python ``str.split()`` (any whitespace run, empties dropped), mirrored
in DuckDB as ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')``.

Scale note: both run Arrow-batched per partition with no shuffle at all
— the plan is scan → eval → (UDTF: generate) — so they trivially scale;
the UDTF's cost model is identical to ``explode`` of an array column.
"""

from __future__ import annotations

from functools import lru_cache

# module-level so pyspark resolves the pandas_udf's stringified type
# hints against this module's globals (same pattern as functions/udfs.py)
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from python_cdc_spark.io import table
from python_cdc_spark.queries.registry import register

_SQL_WS_TOKENS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


@register(
    "udf_udtf_token_explode",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_WS_TOKENS} AS w FROM documents
               WHERE doc_id % 20 = 0)
    SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, w[u.i] AS token
    FROM t, UNNEST(generate_series(1, len(w))) u(i)
    """,
    doc="E29: Python UDTF (text -> (pos, token) rows) via SQL LATERAL "
    "join — the one-to-many Python escape hatch under the oracle gate",
)
def udf_udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize a document sample with a Python UDTF. The 1-in-20
    doc_id sample bounds output rows (UDTF output is |tokens| × docs);
    the UDTF itself is stateless so Spark runs it per-partition with
    no shuffle."""
    from python_cdc_spark.functions.udfs import token_udtf_class

    spark.udtf.register("token_explode", token_udtf_class())
    d = table(spark, sf_dir, "documents").filter("doc_id % 20 = 0")
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM __udtf_docs, LATERAL token_explode(text) t
        """
    )


@lru_cache(maxsize=None)
def _pandas_token_count():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ntok(s: pd.Series) -> pd.Series:
        # str.split() == Python split(): any-whitespace, empties dropped
        return s.str.split().str.len().fillna(0).astype("int64")

    return _ntok


@register(
    "udf_pandas_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_WS_TOKENS}) AS BIGINT) AS n_tokens_udf
    FROM documents
    """,
    doc="E29: Arrow-batched scalar pandas_udf (vectorized token count) "
    "under the oracle gate — exact integer outputs",
)
def udf_pandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", _pandas_token_count()("text").alias("n_tokens_udf"))

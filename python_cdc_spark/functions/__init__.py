"""Scalar/vector function library (E16, E26, E27 building blocks).

All functions here return Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly.
No Python UDFs in this package: the hot path stays vectorized.
"""

from python_cdc_spark.functions.text import (  # noqa: F401
    normalized_text,
    quality_features,
    token_count,
    tokens,
    word_ngrams,
    word_ngrams_from_tokens,
)
from python_cdc_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    dec_dot_product,
)

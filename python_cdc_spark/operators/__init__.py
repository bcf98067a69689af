"""Composite operators: dedup families, similarity search, as-of joins.

Each operator is a DataFrame→DataFrame composition designed for cluster
scale (hash-partitioned shuffles, broadcastable small sides, no driver
loops); the query registry exposes oracle-checked instantiations.
"""

from python_cdc_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from python_cdc_spark.operators.similarity import (  # noqa: F401
    brute_force_top_k,
    hyperplane_lsh_buckets,
)

"""Query registry: every operator exposed to the correctness harness.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
optional DuckDB oracle SQL string over the same parquet views. Names and
output column aliases MUST match between the two sides (the driver sorts
columns by name and hashes values).
"""

from python_cdc_spark.queries.registry import (  # noqa: F401
    QUERIES,
    oracle_sql_map,
    query_map,
    register,
    set_priority_order,
)

# Importing these modules populates the registry.
from python_cdc_spark.queries import (  # noqa: F401, E402
    tpch,
    tpch_extra,
    tpch_patterns,
    relational,
    windows,
    cdc_queries,
    llm_text,
    llm_dedup,
    llm_similarity,
    streaming_queries,
    multimodal_queries,
    udf_queries,
    llm_curation,
    ml_queries,
    analytics,
    sketches,
)

# The driver's correctness gate checks the FIRST 50 registry entries;
# registration order decides which queries earn a driver CORRECTNESS row.
#
# Round-10 rotation (VERDICT r9 item #1): freshness-ordered. Latest-green
# rounds per name recomputed from CORRECTNESS_r01-r09 (r9: 50, r8: 49,
# r7: 50, r6: 13; zero ever-red, zero never-green). The window leads
# with this round's debuts (ann_index_cdc_maintained — the CDC-maintained
# ANN index — and dedup_index_cdc_maintained — the CDC-maintained dedup
# index, both registered mid-round per the debut discipline), then the
# five names whose CODE or ORACLE changed this round and whose latest
# driver row therefore predates the change (sketch_kll_quantiles:
# production variant without the rank-verify join; cdc_pipeline_composite:
# fixture encode moved off the timed path; corpus_sample_weighted_priority:
# tau degenerate-case fallback; cdc_bloom_delta_prune and
# sketch_bloom_membership: oracles regenerated from _PB_K/_BLOOM_K),
# then the 13 queued r06 names from the r9 verdict — dedup_lsh_verified
# FIRST (its size-aware join fix landed after its last driver row).
# The remaining 31 slots refresh r07-latest names, preferring the ones
# whose family has no fresher row; the 19 r07 names that do not fit
# (multimodal decode/resize/frame trio, the scalar-fn quartet
# array/map/date/json, case_when_bucketing, distinct_counts,
# profile_column_stats, embedding_norms, similarity_lsh_buckets,
# text_token_stats, text_bpe_token_estimate, corpus_chunk_sliding,
# corpus_shuffle_epochs, udf_udtf_token_explode, interval_concurrency,
# salted_agg_returnflag — every one family-covered
# by an r08/r09/r10 row) lead the r11 window. Every rotated-out name
# stays covered by the local differ (tests/test_queries_oracle.py, ALL
# queries at sf0.01) and the end-of-round sf0.1/sf1 sweeps. After r10
# lands green, no name's latest green driver row is older than r07.
_WINDOW = [
    # --- Debuts: first driver rows land now (debut-first discipline) ---
    "ann_index_cdc_maintained",
    "dedup_index_cdc_maintained",
    "bm25_index_cdc_maintained",
    # --- Changed this round: rows must postdate the change ---
    "sketch_kll_quantiles",
    "cdc_pipeline_composite",
    "corpus_sample_weighted_priority",
    "cdc_bloom_delta_prune",
    "sketch_bloom_membership",
    # --- The 13 queued r06 names (verdict r9 #1), dedup_lsh_verified first ---
    "dedup_lsh_verified",
    "dedup_minhash_lsh_pairs",
    "dedup_components_canonical",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_keep_first",
    "dedup_ngram_jaccard",
    "similarity_ann_lsh_topk",
    "similarity_brute_topk",
    "similarity_ivf_topk",
    "corpus_split_train_holdout",
    "agg_cube",
    "join_left_outer",
    # --- r07-latest (31 of 50) ---
    "cdc_control_frames",
    "cdc_origin_filtered",
    "cdc_schema_evolution",
    "cdc_truncate_multi_table",
    "corpus_curation_pipeline",
    "corpus_decontaminate_holdout",
    "corpus_pack_shards",
    "corpus_quality_funnel",
    "corpus_stratified_sample",
    "corpus_weighted_mixture",
    "dedup_incremental_fold",
    "dedup_minhash_signatures",
    "dedup_semantic_clusters",
    "dedup_simhash",
    "graph_pagerank_neardup",
    "graph_triangle_count",
    "join_range_banded",
    "ml_linreg_suffstats",
    "ml_pca_covariance_block",
    "q21_sole_blame_supplier",
    "rollup_cdc_partition_pruned",
    "sessionize_events",
    "similarity_pq_topk",
    "streaming_session_window_30m",
    "streaming_sliding_1h_30m",
    "streaming_tumbling_hourly",
    "text_bigram_lm_score",
    "text_bm25_search",
    "text_tf_topk",
    # events_anomaly_mad and text_duplicate_span_coverage (both r07,
    # family-covered by fresher rows) yielded their slots to the second
    # and third debuts; they lead the r11 window with the other 19
    # deferred r07 names
]
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

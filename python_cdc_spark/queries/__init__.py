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
# Round-7 rotation (VERDICT r6 item #3): freshness-ordered. Latest-green
# rounds per name from CORRECTNESS_r01–r06 (r6: 50, r5: 50, r4: 42,
# r3: 9; zero ever-red, zero unchecked). The window leads with this
# round's 6 NEW registrations (debut discipline), then the 9 r03-latest
# leaders the r6 window deferred (named in the r6 verdict), then 35 of
# the 42 r04-latest names. The 7 r04 names that do not fit
# (similarity_rq_topk, similarity_ivfpq_topk, similarity_ivfrq_topk —
# the heaviest rows — plus text_repetition_filter,
# timeseries_gapfill_locf, text_quality_classifier and
# text_fingerprint, all still exercised by the local differ and
# PLANS_AUDIT every round) lead the r8 window; every rotated-out name
# stays covered by the local differ (tests/test_queries_oracle.py, ALL
# queries at sf0.01 + the end-of-round sf0.1 sweep).
_WINDOW = [
    # --- New this round: first driver rows land now ---
    "cdc_truncate_multi_table",
    "rollup_cdc_partition_pruned",
    "cdc_origin_filtered",
    "cdc_schema_evolution",
    "cdc_control_frames",
    "ml_pca_covariance_block",
    # --- The 9 r03-latest leaders (verdict r6 #3) ---
    "array_functions",
    "map_functions",
    "multimodal_frame_sample",
    "streaming_session_window_30m",
    "streaming_sliding_1h_30m",
    "streaming_tumbling_hourly",
    "text_tf_topk",
    "text_token_stats",
    "udf_udtf_token_explode",
    # --- r04-latest (39 of 42) ---
    "case_when_bucketing",
    "corpus_chunk_sliding",
    "corpus_curation_pipeline",
    "corpus_decontaminate_holdout",
    "corpus_pack_shards",
    "corpus_quality_funnel",
    "corpus_shuffle_epochs",
    "corpus_stratified_sample",
    "corpus_weighted_mixture",
    "dedup_incremental_fold",
    "dedup_minhash_signatures",
    "dedup_semantic_clusters",
    "dedup_simhash",
    "distinct_counts",
    "embedding_norms",
    "events_anomaly_mad",
    "graph_pagerank_neardup",
    "graph_triangle_count",
    "interval_concurrency",
    "join_range_banded",
    "json_extraction",
    "ml_linreg_suffstats",
    "multimodal_decode_meta",
    "multimodal_resize",
    "profile_column_stats",
    "q21_sole_blame_supplier",
    "salted_agg_returnflag",
    "scalar_date_funcs",
    "sessionize_events",
    "similarity_lsh_buckets",
    "similarity_pq_topk",
    "text_bigram_lm_score",
    "text_bm25_search",
    "text_bpe_token_estimate",
    "text_duplicate_span_coverage",
]
# r04-latest names that did not fit this window; they lead r8:
# similarity_rq_topk, similarity_ivfpq_topk, similarity_ivfrq_topk,
# text_repetition_filter, timeseries_gapfill_locf,
# text_quality_classifier, text_fingerprint (the last four were
# displaced when the late-r7 debuts — cdc_origin_filtered,
# cdc_schema_evolution, cdc_control_frames, ml_pca_covariance_block —
# took their in-window slots; every rotated-out name stays covered by
# the local differ + the sf0.1 sweep)
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

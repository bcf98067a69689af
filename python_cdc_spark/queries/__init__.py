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
# Round-6 rotation (VERDICT r5 item #2): freshness-ordered. Latest-green
# rounds per name were computed from CORRECTNESS_r01–r05 (r1: 1 name,
# r2: 4, r3: 44, r4: 50, r5: 50; zero ever-red, zero unchecked). The
# window leads with this round's NEW registrations (debut discipline),
# then the 9 r04 bankers the r5 window displaced late (called out by
# name in the r5 verdict), then the 4 names whose latest row is r02,
# then the oldest 35 of the 44 r03-latest names (CDC identity operators
# first). The 9 r03 names that do not fit (listed at the bottom) lead
# the r7 window; every rotated-out name stays covered by the local
# differ (tests/test_queries_oracle.py, ALL queries at sf0.01 + the
# end-of-round sf0.1 sweep).
_WINDOW = [
    # --- New this round: first driver rows land now ---
    "rollup_cdc_maintained",
    "sketch_kll_quantiles",
    # --- The 9 r04 bankers displaced late in r5 (verdict #2) ---
    "q12_priority_class",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_outsized_share_suppliers",
    "table_row_counts",
    "timeseries_moving_avg",
    "window_trailing_range_1h",
    "events_funnel_ordered",
    "events_retention_cohorts",
    # --- Latest green row is r02 (4) ---
    "filter_predicates",
    "join_anti",
    "projection_compute",
    "set_operations",
    # --- Latest green row is r03: CDC identity operators first (6) ---
    "cdc_apply_changes",
    "cdc_scd2_history",
    "cdc_incremental_agg",
    "cdc_latest_per_key",
    "cdc_op_counts",
    "cdc_schema_registry",
    # --- r03-latest: joins / aggregation / window surface (13) ---
    "asof_join_latest_click",
    "join_semi",
    "join_left_outer",
    "join_range_theta",
    "agg_cube",
    "agg_rollup",
    "grouping_sets_sql",
    "pivot_status_by_priority",
    "window_rank_dense_ntile",
    "window_topk_per_group",
    "median_exact_order_stat",
    "percentile_order_values",
    "approx_distinct_users",
    # --- r03-latest: dedup / similarity / text / multimodal (16) ---
    "dedup_exact",
    "dedup_keep_first",
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_components_canonical",
    "similarity_brute_topk",
    "similarity_ivf_topk",
    "similarity_ann_lsh_topk",
    "text_lang_id",
    "text_quality_score",
    "corpus_split_train_holdout",
    "multimodal_binary_metadata",
    "multimodal_doc_embedding_join",
    "udf_pandas_token_count",
]
# r03-latest names that did not fit this window; they lead r7:
# array_functions, map_functions, multimodal_frame_sample,
# streaming_session_window_30m, streaming_sliding_1h_30m,
# streaming_tumbling_hourly, text_tf_topk, text_token_stats,
# udf_udtf_token_explode
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

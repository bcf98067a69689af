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
# Round-12 rotation (VERDICT r11 item #1): freshness-ordered. Latest-green
# rounds per name recomputed from CORRECTNESS_r01-r11 (r11: 50, r10: 46,
# r09: 47, r08: 22; zero ever-red, zero never-green). The window leads
# with ALL 22 r08-latest names (q4_order_priority first) — the standing
# coverage contract's boundary set. Next, the 17 names whose CODE
# changed this round and whose latest driver row therefore predates the
# change (BM25: one-pass fold + positional postings + positions-optional
# mode; FIVE DEBUTS — text_bm25_phrase_search, bm25_phrase_cdc_maintained,
# bm25_fold_narrow_delta, dedup_fold_narrow_delta,
# sketch_heavyhitters_exact; the fsops isolation touched the
# dedup/ANN/rollup maintained structures; the literal_df sweep touched
# the k-means/PQ/RQ codebook tables,
# cdc_schema_evolution/cdc_pipeline_composite fixtures, and the
# origin-carry join). The remaining 11 slots refresh the OLDEST
# r09-latest names (agg_rollup..dedup_edit_distance_verified,
# alphabetical). Every rotated-out name stays covered by the local
# differ (tests/test_queries_oracle.py, ALL queries at sf0.01) and the
# end-of-round sf0.1/sf1 sweeps. After r12 lands green, no name's
# latest green driver row is older than r09.
_WINDOW = [
    # --- The 22 r08-latest names (verdict r11 #1), q4_order_priority first ---
    "q4_order_priority",
    "scalar_math_funcs",
    "scalar_string_funcs2",
    "similarity_ivfpq_topk",
    "similarity_ivfrq_topk",
    "similarity_rq_topk",
    "sketch_countmin_partkeys",
    "sketch_hll_groupwise",
    "sketch_hll_orderkeys",
    "stats_deterministic_moments",
    "text_fingerprint",
    "text_pii_redact",
    "text_quality_classifier",
    "text_repetition_filter",
    "text_vocab_zipf_stats",
    "timeseries_ewma_recursive",
    "timeseries_gapfill_locf",
    "timeseries_seasonal_profile",
    "unpivot_quarterly_revenue",
    "window_lag_lead",
    "window_running_total",
    "window_value_navigation",
    # --- Changed this round: rows must postdate the change (5 debuts) ---
    "sketch_heavyhitters_exact",
    "bm25_fold_narrow_delta",
    "dedup_fold_narrow_delta",
    "bm25_index_cdc_maintained",
    "bm25_phrase_cdc_maintained",
    "text_bm25_phrase_search",
    "dedup_index_cdc_maintained",
    "dedup_incremental_fold",
    "ann_index_cdc_maintained",
    "similarity_ivf_topk",
    "similarity_pq_topk",
    "dedup_semantic_clusters",
    "rollup_cdc_maintained",
    "rollup_cdc_partition_pruned",
    "cdc_schema_evolution",
    "cdc_pipeline_composite",
    "cdc_origin_filtered",
    # --- Oldest r09-latest refresh (14 of 46 remaining) ---
    "agg_rollup",
    "approx_distinct_users",
    "asof_join_latest_click",
    "cdc_apply_changes",
    "cdc_incremental_agg",
    "cdc_latest_per_key",
    "cdc_op_counts",
    "cdc_scd2_history",
    "cdc_schema_registry",
    "corpus_split_chisquare",
    "dedup_edit_distance_verified",
]
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

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
# Round-13 rotation (VERDICT r12 item #1): freshness-ordered. Latest-green
# rounds per name recomputed from CORRECTNESS_r01-r12 (r12: 50, r11: 47,
# r10: 38, r09: 35; zero ever-red, zero never-green). The window leads
# with ALL 35 r09-latest names (the true stale set the r12 verdict
# enumerated — events_exact_deciles..window_trailing_range_1h,
# alphabetical), so after r13 lands green no name's latest driver row
# is older than r10. Next, the 12 names whose CODE changed this round
# and whose latest row therefore predates the change (the cas_publish /
# stage-and-claim refactor touched every maintained structure's commit
# path: BM25 index/phrase/search + both narrow folds, dedup
# index/incremental fold, ANN index, both rollup gates; plus the
# heavy-hitters null-filter fix and the copy-free dedup narrow gate).
# The remaining 3 slots start the r10-latest refresh (agg_cube..,
# alphabetical). Every rotated-out name stays covered by the local
# differ (tests/test_queries_oracle.py, ALL queries at sf0.01) and the
# end-of-round sf0.1/sf1 sweeps.
_WINDOW = [
    # --- The 35 r09-latest names (verdict r12 #1), alphabetical ---
    "events_exact_deciles",
    "events_funnel_ordered",
    "events_markov_transitions",
    "events_retention_cohorts",
    "filter_predicates",
    "graph_clustering_coefficient",
    "graph_kcore_membership",
    "grouping_sets_sql",
    "join_anti",
    "join_range_theta",
    "join_semi",
    "median_exact_order_stat",
    "multimodal_binary_metadata",
    "multimodal_doc_embedding_join",
    "part_affinity_lift",
    "percentile_order_values",
    "pivot_status_by_priority",
    "projection_compute",
    "q11_important_parts",
    "q12_priority_class",
    "q20_outsized_share_suppliers",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "set_operations",
    "sketch_kmv_returnflag_overlap",
    "table_row_counts",
    "text_bpe_learn_merges",
    "text_lang_id",
    "text_quality_score",
    "timeseries_autocorrelation",
    "timeseries_moving_avg",
    "udf_pandas_token_count",
    "window_rank_dense_ntile",
    "window_topk_per_group",
    "window_trailing_range_1h",
    # --- Changed this round: rows must postdate the change ---
    "sketch_heavyhitters_exact",
    "dedup_fold_narrow_delta",
    "bm25_fold_narrow_delta",
    "bm25_index_cdc_maintained",
    "bm25_phrase_cdc_maintained",
    "text_bm25_phrase_search",
    "text_bm25_search",
    "dedup_index_cdc_maintained",
    "dedup_incremental_fold",
    "ann_index_cdc_maintained",
    "rollup_cdc_maintained",
    "rollup_cdc_partition_pruned",
    # --- r10-latest refresh begins (3 of 38, alphabetical) ---
    "agg_cube",
    "cdc_bloom_delta_prune",
    "cdc_control_frames",
]
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

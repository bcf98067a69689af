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
# Round-11 rotation (VERDICT r10 item #1): freshness-ordered. Latest-green
# rounds per name recomputed from CORRECTNESS_r01-r10 (r10: 50, r9: 47,
# r8: 47, r7: 21; zero ever-red, zero never-green). The window leads
# with ALL 21 r07-latest names — the standing coverage contract says no
# name's latest green driver row may age past r08, and these are the
# boundary set (events_anomaly_mad first: it yielded its r10 slot to a
# debut). Next, the four names whose CODE changed this round and whose
# latest driver row therefore predates the change
# (bm25_index_cdc_maintained: crash-exact versioned fold + replay guard
# + gate-cost separation; dedup_index_cdc_maintained: CDC fingerprint
# now digests text content, gate-cost separation;
# ann_index_cdc_maintained: gate-cost separation; text_bm25_search:
# top-k plan pinned). The remaining 25 slots refresh r08-latest names —
# the full r08 TPC-H block plus rollup rewrites and revenue rollups.
# The 22 r08 names that do not fit (analytics/sketch/text/timeseries/
# window families, every one family-covered by an r09/r10 row) lead the
# r12 window. Every rotated-out name stays covered by the local differ
# (tests/test_queries_oracle.py, ALL queries at sf0.01) and the
# end-of-round sf0.1/sf1 sweeps. After r11 lands green, no name's
# latest green driver row is older than r08.
_WINDOW = [
    # --- The 21 r07-latest names (verdict r10 #1), events_anomaly_mad first ---
    "events_anomaly_mad",
    "text_duplicate_span_coverage",
    "array_functions",
    "case_when_bucketing",
    "corpus_chunk_sliding",
    "corpus_shuffle_epochs",
    "distinct_counts",
    "embedding_norms",
    "interval_concurrency",
    "json_extraction",
    "map_functions",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    "profile_column_stats",
    "salted_agg_returnflag",
    "scalar_date_funcs",
    "similarity_lsh_buckets",
    "text_bpe_token_estimate",
    "text_token_stats",
    "udf_udtf_token_explode",
    # --- Changed this round: rows must postdate the change ---
    "bm25_index_cdc_maintained",
    "dedup_index_cdc_maintained",
    "ann_index_cdc_maintained",
    "text_bm25_search",
    # --- r08-latest refresh (25 of 47) ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_type_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_dormant_customers",
    "revenue_by_nation_region",
    "revenue_yoy_growth",
    "rollup_distinct_parts_rewrite",
    "rollup_revenue_rewrite",
    "customer_rfm_segments",
    "data_quality_checks",
    "events_cusum_drift",
    "events_histogram_equiwidth",
    "join_key_skew_report",
    "parts_pareto_abc",
]
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

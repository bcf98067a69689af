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
# Round-5 rotation (VERDICT r4 item #1): slots 1-6 are the ONLY queries
# with no driver row at all — the analytics/diagnostics pack registered
# after r4's window shipped (the two r4 perf-weak plans fixed BEFORE
# this debut: RFM now uses the distributed exact NTILE, affinity caps
# baskets; cusum carries the ADVICE p_0=0 floor fix, histogram the
# degenerate-bounds guard). Slots 7-18 are the 12 once-green TPC-H
# variants waiting since r01 for their second row; slots 19-30 the
# remaining r01-once-greens. The rest of the window banks second rows
# for r04 first-timers. Rotated-out queries all hold 2+ green rows and
# stay covered by the local differ (tests/test_queries_oracle.py, ALL
# queries at sf0.01 + the end-of-round sf0.1 sweep).
set_priority_order(
    [
        # --- Never-driver-checked block (6): first rows land now ---
        "events_histogram_equiwidth",
        "customer_rfm_segments",
        "revenue_yoy_growth",
        "part_affinity_lift",
        "events_cusum_drift",
        "join_key_skew_report",
        # --- Once-green TPC-H variants (12, green only in r01) ---
        "q4_order_priority",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_part_type_counts",
        "q17_small_quantity_revenue",
        "q18_large_volume_customers",
        "q19_discounted_revenue",
        "q22_dormant_customers",
        # --- Remaining r01-once-greens (12) ---
        "revenue_by_nation_region",
        "scalar_math_funcs",
        "scalar_string_funcs2",
        "stats_deterministic_moments",
        "window_lag_lead",
        "window_running_total",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q10_returned_items",
        "q13_customer_distribution",
        # --- New this round (9): first driver rows land now ---
        "events_exact_deciles",
        "dedup_edit_distance_verified",
        "text_vocab_zipf_stats",
        "corpus_split_chisquare",
        "timeseries_ewma_recursive",
        "events_markov_transitions",
        "parts_pareto_abc",
        "graph_clustering_coefficient",
        "graph_kcore_membership",
        "sketch_hll_orderkeys",
        "sketch_countmin_partkeys",
        "sketch_kmv_returnflag_overlap",
        "sketch_hll_groupwise",
        "timeseries_autocorrelation",
        "data_quality_checks",
        "rollup_revenue_rewrite",
        "window_value_navigation",
        "timeseries_seasonal_profile",
        "rollup_distinct_parts_rewrite",
        "text_pii_redact",
        "unpivot_quarterly_revenue",
    ]
)

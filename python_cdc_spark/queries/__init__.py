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
# Round-8 rotation (VERDICT r7 item #2): freshness-ordered. Latest-green
# rounds per name from CORRECTNESS_r01–r07 (r7: 50, r6: 50, r5: 50,
# r4: 7; zero ever-red, zero unchecked). The window leads with this
# round's 2 NEW registrations (debut discipline — both registered
# mid-round, not in the window's final hours, per the r7 ADVICE note on
# holding late-round debuts), then the 7 r04-latest names the r7
# verdict queued as this round's leaders, then 41 of the 50 r05-latest
# names. The 9 r05 names that do not fit
# (graph_clustering_coefficient, graph_kcore_membership,
# dedup_edit_distance_verified, events_exact_deciles,
# events_markov_transitions, corpus_split_chisquare,
# timeseries_autocorrelation, sketch_kmv_returnflag_overlap,
# part_affinity_lift — the rows with the most expensive DuckDB
# oracles: iterative/materialized CTE chains, exact global deciles,
# all-pairs edit distance, the pairwise-lift self-join) lead the r9
# window; every rotated-out name stays covered by the local differ
# (tests/test_queries_oracle.py, ALL queries at sf0.01) and the
# end-of-round sf0.1 sweep.
_WINDOW = [
    # --- New this round: first driver rows land now ---
    "cdc_pipeline_composite",
    "sketch_bloom_membership",
    # --- The 7 r04-latest leaders (verdict r7 #2) ---
    "similarity_rq_topk",
    "similarity_ivfpq_topk",
    "similarity_ivfrq_topk",
    "text_repetition_filter",
    "timeseries_gapfill_locf",
    "text_quality_classifier",
    "text_fingerprint",
    # --- r05-latest (41 of 50) ---
    "customer_rfm_segments",
    "data_quality_checks",
    "events_cusum_drift",
    "events_histogram_equiwidth",
    "join_key_skew_report",
    "parts_pareto_abc",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_type_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q1_pricing_summary",
    "q22_dormant_customers",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "revenue_by_nation_region",
    "revenue_yoy_growth",
    "rollup_distinct_parts_rewrite",
    "rollup_revenue_rewrite",
    "scalar_math_funcs",
    "scalar_string_funcs2",
    "sketch_countmin_partkeys",
    "sketch_hll_groupwise",
    "sketch_hll_orderkeys",
    "stats_deterministic_moments",
    "text_pii_redact",
    "text_vocab_zipf_stats",
    "timeseries_ewma_recursive",
    "timeseries_seasonal_profile",
    "unpivot_quarterly_revenue",
    "window_lag_lead",
    "window_running_total",
    "window_value_navigation",
]
assert len(_WINDOW) == 50, f"driver window must hold exactly 50, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == 50, "duplicate names in the driver window"
set_priority_order(_WINDOW)

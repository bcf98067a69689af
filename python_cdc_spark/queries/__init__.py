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
)

# The driver's correctness gate checks the FIRST 50 registry entries;
# registration order decides which queries earn a driver CORRECTNESS row.
#
# Round-4 rotation (VERDICT r3 item #1): finish driver verification of
# the registry. Slots 1-21 are the 21 queries with no green driver row —
# q12_priority_class FIRST (the only ever-red query; its HUGEINT-class
# fix from r2 has been self-attested two rounds) followed by the 20
# never-driver-checked entries. Slots 22-50 are once-green queries
# banking their second green row (rotation-out eligibility). The 37
# queries rotated out all hold 1-2 green rows already and stay covered
# by the local differ in tests/test_queries_oracle.py (ALL registered
# queries, sf0.01 and the end-of-round sf0.1 sweep). Ten once-green
# TPC-H variants (q4 q6 q7 q8 q9 q14 q15 q16 q17 q22) wait for r5.
set_priority_order(
    [
        # --- Never-green / never-checked block (21) ---
        "q12_priority_class",  # ever-red in r01; fixed r2; must go green
        "q2_min_cost_supplier",
        "q11_important_parts",
        "q20_outsized_share_suppliers",
        "q21_sole_blame_supplier",
        "join_range_banded",
        "interval_concurrency",
        "timeseries_moving_avg",
        "window_trailing_range_1h",
        "events_funnel_ordered",
        "events_retention_cohorts",
        "text_bpe_token_estimate",
        "text_bm25_search",
        "text_bigram_lm_score",
        # new this round: Gopher-style repetition filter — in-window so
        # its first driver row lands now (slot from once-green
        # q19_discounted_revenue)
        "text_repetition_filter",
        "dedup_minhash_signatures",
        "embedding_norms",
        "similarity_ivfpq_topk",
        # new this round: recall-lifted IVF-RQ composite — in-window so
        # its first driver row lands the round it ships (takes the slot
        # of once-green revenue_by_nation_region)
        "similarity_ivfrq_topk",
        "corpus_stratified_sample",
        "corpus_weighted_mixture",
        "corpus_quality_funnel",
        "corpus_decontaminate_holdout",
        # new this round: sliding-window chunker — in-window (slot from
        # once-green q18_large_volume_customers)
        "corpus_chunk_sliding",
        # --- New this session (6): first driver rows land this round ---
        "timeseries_gapfill_locf",
        "text_duplicate_span_coverage",
        "text_quality_classifier",
        "profile_column_stats",
        "dedup_semantic_clusters",
        "corpus_curation_pipeline",
        "dedup_incremental_fold",
        "ml_linreg_suffstats",
        "corpus_shuffle_epochs",
        "graph_triangle_count",
        "events_anomaly_mad",
        # --- Once-green block: bank the second green row (entries past
        # position 50 simply wait for the next rotation) ---
        "sessionize_events",
        "similarity_pq_topk",
        "similarity_rq_topk",
        "graph_pagerank_neardup",
        "corpus_pack_shards",
        "multimodal_resize",
        "dedup_simhash",
        "similarity_lsh_buckets",
        "text_fingerprint",
        "multimodal_decode_meta",
        "case_when_bucketing",
        "distinct_counts",
        "json_extraction",
        "salted_agg_returnflag",
        "scalar_date_funcs",
        "scalar_math_funcs",
        "scalar_string_funcs2",
        "stats_deterministic_moments",
        "table_row_counts",
        "window_lag_lead",
        "window_running_total",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q10_returned_items",
        "q13_customer_distribution",
    ]
)

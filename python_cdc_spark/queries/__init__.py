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
)

# The driver's correctness gate checks the FIRST 50 registry entries, so
# the first 50 are chosen for SURVEY.md §2 component breadth: the flagship
# CDC operator set, every LLM-pipeline algorithm (dedup / similarity /
# text / multimodal), the streaming batch-twins, then one representative
# per relational component (join kinds, rollup, pivot, set ops, scalar
# families, approx/percentile). Redundant TPC-H variants and extra window
# drills follow after the window — still registered, still pytest-covered.
set_priority_order(
    [
        # CDC core (R3-R10, R17-analog, E18, E19)
        "cdc_apply_changes",
        "cdc_scd2_history",
        "cdc_latest_per_key",
        "cdc_op_counts",
        "cdc_schema_registry",
        # IVM: signed-delta aggregate maintenance (takes embedding_norms'
        # slot — vector math stays verified via every similarity query)
        "cdc_incremental_agg",
        # Dedup family (E25, E26) — signatures themselves are exercised
        # inside the lsh_pairs/verified oracles (same CTE chain), so the
        # standalone signature dump yields its window slot to the
        # transitive-closure clustering query
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh_pairs",
        "dedup_simhash",
        "dedup_lsh_verified",
        "dedup_components_canonical",
        "dedup_embedding_cosine",
        # Similarity search (E26, E28)
        "similarity_brute_topk",
        "similarity_lsh_buckets",
        "similarity_ann_lsh_topk",
        "similarity_ivf_topk",
        "multimodal_doc_embedding_join",
        # Text analysis (E27)
        "text_token_stats",
        "text_quality_score",
        "text_lang_id",
        "text_fingerprint",
        "text_tf_topk",
        # Multimodal plumbing (E28)
        "multimodal_binary_metadata",
        "multimodal_decode_meta",
        "multimodal_frame_sample",
        # Streaming batch-twins (E20-E23)
        "streaming_tumbling_hourly",
        "streaming_sliding_1h_30m",
        "streaming_session_window_30m",
        # Windows / ordered analytics (E9, E13, E14, E21, E23, E11)
        "asof_join_latest_click",
        "sessionize_events",
        "dedup_keep_first",
        "window_topk_per_group",
        # running-total's E13 slot goes to the curation split (a class
        # the window otherwise lacks); E13 stays represented by the
        # topk/sessionize/keep-first/median rows
        "corpus_split_train_holdout",
        "median_exact_order_stat",
        "percentile_order_values",
        "approx_distinct_users",
        # UDF surface (E29): UDTF + Arrow pandas_udf under the gate
        "udf_udtf_token_explode",
        "udf_pandas_token_count",
        # Relational representatives (E3-E8, E11, E12, E15-E17; E16 is
        # represented by json/array/map — the round-1 harness-crash pair
        # stays in-window to keep its fix visible)
        "projection_compute",
        "filter_predicates",
        "join_left_outer",
        "join_semi",
        "join_anti",
        "join_range_theta",
        "agg_rollup",
        "pivot_status_by_priority",
        "set_operations",
        "array_functions",
        "map_functions",
    ]
)

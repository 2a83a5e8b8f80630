"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 via
the package's plan registry (date_warehouse___airline_project_spark/plans/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from date_warehouse___airline_project_spark import plans

plans.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Queries already hash-certified by the driver's 50-query correctness window
# in a prior round (keys of CORRECTNESS_r{N}.json). The driver checks the
# FIRST 50 registry entries each round, so ``queries()`` emits uncertified
# queries first — rotating the whole registry through the gate across
# rounds. Certified rows stay registered (still run, still bench'd), just
# later in iteration order.
_CERTIFIED_R01 = [
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_region_nation_revenue",
    "semi_join_customers_with_big_orders", "anti_join_customers_without_orders",
    "latest_order_per_customer", "dedup_orders_keep_first",
    "running_totalprice_per_customer", "topk_recent_events",
    "duplicate_key_pairs", "distinct_dedup_exact",
    "set_ops_high_value_not_building", "union_event_users",
    "nation_pair_trade_volume", "brand_share_by_year", "cheapest_part_supplier",
    "market_share_by_segment", "rollup_revenue_region_nation",
    "string_normalize_profile", "multi_format_date_parse",
    "currency_clean_round_clip", "md5_identity_keys", "json_extract_events",
    "validity_split_quarantine_counts", "enum_normalize_value_map",
    "eligibility_verdicts", "amount_consistency_check", "date_parts_and_age",
    "doc_token_counts", "doc_quality_scores", "doc_fingerprint_dupes",
    "doc_langid_heuristic", "doc_bpe_token_estimate", "doc_lang_distribution",
    "doc_tfidf_top_terms", "doc_sliding_chunks", "doc_bigram_collocations",
    "emb_cosine_topk", "emb_ivf_topk", "emb_ivf_trained_topk",
    "emb_neardup_bucketed", "emb_norm_stats_per_label", "emb_int8_quantization",
    "minhash_lsh_dupes", "simhash_dupes", "neardup_cluster_assignment",
    "ngram_jaccard_dupes", "tumbling_window_counts", "sliding_window_counts",
    "session_window_stats",
]
_CERTIFIED_R02 = [
    "emb_neardup_multitable", "fuzzy_wratio_correction",
    "doc_decontamination_overlap", "doc_repeated_ngram_ratio",
    "doc_shard_export_assignment", "q4_order_priority",
    "bloom_membership_sketch", "cms_frequency_sketch", "media_meta_extract",
    "media_frame_fanout", "scd2_dim_two_batches", "pii_mask_and_name_split",
    "geo_finance_battery", "fuzzy_code_correction",
    "encoding_functions_battery", "sql_forecast_revenue_change",
    "sql_priority_order_counts", "sql_exists_notexists_text",
    "sql_correlated_scalar_text", "sql_lateral_topn_text",
    "sql_not_in_null_semantics", "q13_order_count_distribution",
    "q15_top_supplier_revenue", "q16_supplier_counts_not_in",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_predicates", "q20_nested_in_suppliers",
    "q21_sole_late_supplier", "q22_idle_rich_customers",
    "q11_supplier_value_share", "lead_lag_order_gaps", "ntile_rank_acctbal",
    "percentile_totalprice_by_priority", "cube_returnflag_linestatus",
    "pivot_nation_segment_counts", "stats_quantity_battery",
    "grouping_sets_revenue", "trailing_30d_customer_spend",
    "percentile_disc_cume_dist", "trailing_distinct_users",
    "linear_regression_exact", "asof_purchase_before_error",
    "range_join_inflight_shipments", "followup_error_after_purchase",
    "doc_top_words", "user_event_sequences",
]
# Round-3 priority: the three r02 hash-reds (oracle typing now fixed —
# CAST(SUM(...) AS BIGINT), see plans/training_data.py) must re-certify,
# followed by the three latent carriers of the same DuckDB
# HUGEINT->float64 landmine that rotation hasn't exposed yet. Everything
# else uncertified (the function/array/map/calendar batteries, TPC-H
# Q9/Q10/Q14, profiling, sessionization, gapfill) follows in registry
# order — after this round every registry query has a driver-green row.
_PRIORITY = [
    "doc_sequence_packing",
    "doc_source_weighted_sample",
    "doc_curation_pipeline",
    "q12_priority_line_counts",
    "variant_event_props",
    "lag_gap_sessionization",
    # re-cert: scorer gained token_set + the 0.6 long-string regime in r03
    "fuzzy_wratio_correction",
    # new in r03: persisted-IVF lifecycle search
    "emb_ivf_indexed_topk",
]

# Queries ADDED in round 3 (beyond emb_ivf_indexed_topk, which leads via
# _PRIORITY). Ordered AFTER the never-certified round-1/2 surface: priority
# (8) + old-uncertified (42) fill the driver's 50-query window exactly, so
# every pre-r03 registry query gets a driver-green row this round; these
# six rotate into the r04 window (all are locally oracle-green meanwhile).
_NEW_R03 = [
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_national_market_share",
    "doc_duplicate_spans",
    "emb_filtered_topk",
    "hll_distinct_sketch",
    "emb_pq_topk",
    "doc_neardup_keep_canonical",
    "emb_ivfpq_topk",
    "doc_hashed_embedding_neardup",
    "incremental_dedup_bloom",
    "doc_negative_sampling",
    "emb_semdedup_prune",
    "doc_packed_sequences",
    "doc_train_val_test_split",
    "hll_grouped_daily_uniques",
    "cms_heavy_hitters_verified",
    "spatial_radius_gridjoin",
    "pareto_frontier_orders",
    "doc_weighted_sample_topk",
    "doc_gopher_rules",
    "doc_containment_pairs",
    "doc_curation_pipeline_v2",
    "dedup_method_agreement",
    "emb_mmr_diverse_topk",
    "emb_centroid_summaries",
]

# A query whose behavior changed this round is no longer certified — it
# re-enters the window via _PRIORITY.
_CERTIFIED = (set(_CERTIFIED_R01) | set(_CERTIFIED_R02)) - set(_PRIORITY)


def _ordered_names() -> list[str]:
    names = list(plans.REGISTRY)
    pri = [n for n in _PRIORITY if n in plans.REGISTRY]
    new = [n for n in _NEW_R03 if n in plans.REGISTRY]
    skip = set(pri) | set(new)
    rest = [n for n in names if n not in _CERTIFIED and n not in skip]
    cert = [n for n in names if n in _CERTIFIED]
    return pri + rest + new + cert


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return plans.REGISTRY["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: plans.REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: plans.REGISTRY[name].oracle
        for name in _ordered_names()
        if plans.REGISTRY[name].oracle is not None
    }

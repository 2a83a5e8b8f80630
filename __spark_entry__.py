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
_CERTIFIED = set(_CERTIFIED_R01)

# Queries NEW this round: least-proven, so they go at the very front of the
# driver's correctness window.
_PRIORITY = [
    "emb_neardup_multitable",
    "fuzzy_wratio_correction",
    "doc_decontamination_overlap",
    "doc_repeated_ngram_ratio",
    "doc_sequence_packing",
    "doc_source_weighted_sample",
    "doc_shard_export_assignment",
    "doc_curation_pipeline",
    "q4_order_priority",
    "bloom_membership_sketch",
    "cms_frequency_sketch",
]


def _ordered_names() -> list[str]:
    names = list(plans.REGISTRY)
    pri = [n for n in _PRIORITY if n in plans.REGISTRY]
    rest = [n for n in names if n not in _CERTIFIED and n not in set(pri)]
    cert = [n for n in names if n in _CERTIFIED]
    return pri + rest + cert


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

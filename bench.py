"""Benchmark runner: executes every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a count-style action (collect of the final
result — the results are small aggregates/top-ks by design; full-table
projections are counted instead to avoid driver transfer noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Queries whose result is a full-table projection: benchmark with .count()
# (materializes the whole plan) instead of collect() to keep driver
# transfer out of the measurement.
_COUNT_ONLY = {
    "string_normalize_profile",
    "multi_format_date_parse",
    "currency_clean_round_clip",
    "md5_identity_keys",
    "amount_consistency_check",
    "date_parts_and_age",
    "doc_token_counts",
    "doc_quality_scores",
    "latest_order_per_customer",
    "running_totalprice_per_customer",
    "dedup_orders_keep_first",
    "distinct_dedup_exact",
    "semi_join_customers_with_big_orders",
    "anti_join_customers_without_orders",
    "set_ops_high_value_not_building",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    "scd2_dim_two_batches",
    "doc_langid_heuristic",
    "doc_bpe_token_estimate",
    "media_meta_extract",
    "lead_lag_order_gaps",
    "ntile_rank_acctbal",
    "asof_purchase_before_error",
    "user_event_sequences",
    "followup_error_after_purchase",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from date_warehouse___airline_project_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # warmup: JVM + parquet footer caches, plus one tiny Arrow/Python-UDF
    # round-trip so measured queries see warm Python workers (worker spawn
    # is a fixed per-session cost, not a per-query one)
    entry_mod.plans.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name in _COUNT_ONLY:
            df.count()
        else:
            df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()

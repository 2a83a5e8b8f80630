"""Plan audit: sweep every registry query's executed plan for scale
anti-patterns. Run at a small SF (plans are scale-invariant):

    python tools/plan_audit.py [sf_dir]

Flags, per query:
  CARTESIAN      CartesianProduct anywhere in the plan
  NESTED-LOOP    BroadcastNestedLoopJoin (legitimate only for explicit
                 range/interval joins over a broadcast grid — allowlisted)
  GLOBAL-WINDOW  a window function with no PARTITION BY (single-task sort;
                 legitimate only over pre-aggregated frames — allowlisted)
  GLOBAL-SORT    a final Sort whose Exchange is a SinglePartition (vs
                 rangepartitioning, which parallelizes) — almost always a
                 missing tie-break or an orderBy on a non-range key

Exit code 1 if any non-allowlisted flag fires, so it can gate CI.
"""

from __future__ import annotations

import re
import sys

# query -> reasons documented in the query docstring.
# NESTED-LOOP is legitimate in exactly two shapes, both with a broadcast
# build side that is constant-size in the corpus:
#   (a) a 1-row scalar attach (query vector, corpus count, AVG/total scalar
#       subquery) — there is no join key, so BNLJ IS the right operator;
#   (b) an explicit small-grid/candidate cross join (range-join month grid,
#       distinct-dirty-values x dim candidate generation).
ALLOW = {
    "range_join_inflight_shipments": {"NESTED-LOOP"},  # (b) broadcast month grid
    "cross_artifact_reconciliation": {"NESTED-LOOP"},  # (a) 1-row index
    # high-water-mark scalar (streaming/reconcile.py hi_rel) broadcast-
    # attached to the released-ids frontier filters — new r11 query,
    # first audited this round
    "asof_purchase_before_error": {"NESTED-LOOP"},  # (b) broadcast asof probe set
    "emb_cosine_topk": {"NESTED-LOOP"},  # (a) 1-row query vector
    "emb_ivf_topk": {"NESTED-LOOP"},  # (a) 1-row query vector
    "emb_ivf_trained_topk": {"NESTED-LOOP"},  # (a) 1-row query vector
    "emb_ivf_indexed_topk": {"NESTED-LOOP"},  # (a) 1-row query vector
    "emb_filtered_topk": {"NESTED-LOOP"},  # (a) 1-row query vector
    "fuzzy_code_correction": {"NESTED-LOOP"},  # (b) distinct-values x dim
    "fuzzy_wratio_correction": {"NESTED-LOOP"},  # (b) distinct-values x dim
    "q11_supplier_value_share": {"NESTED-LOOP"},  # (a) total-value scalar
    "q22_idle_rich_customers": {"NESTED-LOOP"},  # (a) avg-acctbal scalar
    "cheapest_part_supplier": {"NESTED-LOOP"},  # (a) min-cost scalar
    "doc_tfidf_top_terms": {"NESTED-LOOP"},  # (a) corpus-size scalar for idf
    "trailing_distinct_users": {"NESTED-LOOP"},  # (a) date-bounds scalar
    "funnel_stage_counts": {"NESTED-LOOP"},  # (a) stage-total scalar
    "bloom_membership_sketch": {"NESTED-LOOP"},  # (a) 1-row stat aggregates
    "bloom_fpr_curve": {"NESTED-LOOP"},  # (a) 1-row stat aggregates per size
    "hll_distinct_sketch": {"NESTED-LOOP"},  # (a) 1-row stat aggregates
    "hll_set_algebra": {"NESTED-LOOP"},  # (a) 1-row sketch summaries + exact stats
    "dedup_method_agreement": {"NESTED-LOOP"},  # (a) 1-row count aggregates
    "emb_mmr_diverse_topk": {"NESTED-LOOP"},  # (a) 1-row query vector + bounded pool
    "emb_pq_topk": {"NESTED-LOOP"},  # (a) 1-row query vector + 50-row re-rank
    "emb_ivfpq_topk": {"NESTED-LOOP"},  # (a) 1-row query vector + 50-row re-rank
    "emb_ivfpq_trained_topk": {"NESTED-LOOP"},  # (a) 1-row query vector + 50-row re-rank
    "emb_ivfpq_indexed_topk": {"NESTED-LOOP"},  # (a) 1-row query vector: probe, ADC table, re-rank
    # (b) codebook x bounded query-batch probe grid + per-query ADC
    # weight table + Q x rerank re-rank join — all broadcast, all
    # constant-size in the corpus (queries is a bounded batch by contract)
    "emb_ivfpq_knn_join": {"NESTED-LOOP"},
    "emb_ivfpq_recall_compare": {"NESTED-LOOP"},  # (a) 1-row query vector; 10-row truth broadcast
    "doc_release_manifest": {"NESTED-LOOP"},  # (a) 1-row token-budget scalar attach
    # same 1-row budget attach, inherited via _release_assignment:
    "doc_release_takedown_diff": {"NESTED-LOOP"},
    "doc_release_provenance": {"NESTED-LOOP"},
    "doc_release_incremental_update": {"NESTED-LOOP"},
    "doc_release_version_diff": {"NESTED-LOOP"},
    "doc_release_backfill_revision": {"NESTED-LOOP"},  # same release-cascade 1-row scalar attaches, both versions
    # codebook-bounded (<=25 rows): the rank window and the 1-row total
    # attach both operate on the cell relation, never on vectors
    "emb_ivf_cell_occupancy": {"GLOBAL-WINDOW", "NESTED-LOOP"},
    "media_embedding_topk": {"NESTED-LOOP"},  # (a) 1-row query vector
    "emb_ivf_recall_at10": {"NESTED-LOOP"},  # (a) 1-row query vector + 10-row truth
    "profile_drift_psi": {"NESTED-LOOP"},  # (a) 1-row window-totals attach
    "doc_unigram_logprob_filter": {"NESTED-LOOP"},  # (a) 1-row corpus-token total
    "basket_brand_pairs": {"NESTED-LOOP"},  # (a) 1-row basket-count scalar
    "basket_association_rules": {"NESTED-LOOP"},  # (a) 1-row basket-count scalar
    "benford_totalprice": {"NESTED-LOOP"},  # (a) 1-row digit-total scalar
    "chisq_priority_status": {"NESTED-LOOP"},  # (a) 1-row N attach to cell relation
    "customer_rfm_segments": {"NESTED-LOOP"},  # (a) 1-row corpus-max-date attach
    "neardup_degree_distribution": {"NESTED-LOOP"},  # (a) 1-row totals attach
    # (b) source × vocabulary dense grid — both sides domain-bounded
    "jsd_source_divergence": {"NESTED-LOOP"},
    # (a) 1-row best-pair attach per merge round, applied to the
    # vocabulary relation (Heaps-bounded, never the corpus)
    "bpe_merge_rounds": {"NESTED-LOOP"},
    # (b) broadcast query-set grid (vec_id % 100, constant-size in the
    # corpus) — scoring is map-side; top-k windows are salted/partitioned
    "emb_knn_join": {"NESTED-LOOP"},
    # same broadcast grid; final orderBy("qid") sorts the probe-bounded
    # (≤100-row) grouped overlap relation — corpus-scale work ended at
    # the per-qid top-k; same class as its allowlisted kNN siblings
    "emb_dim_truncation_overlap": {"NESTED-LOOP", "GLOBAL-SORT"},
    # (a) 1-row budget/sqrt-sum scalar attach to the per-source relation
    "doc_token_budget_allocation": {"NESTED-LOOP"},
    "market_share_by_segment": {"GLOBAL-WINDOW"},  # window over 5-row agg
    "sql_forecast_revenue_change": {"GLOBAL-WINDOW"},  # lag over 7-row agg
    # (a)+(b): 1-row total attach + 3-probe theta-join, both against the
    # ≤300-row bin relation; cumsum window runs over that bin relation
    "quantile_sketch_totalprice": {"NESTED-LOOP", "GLOBAL-WINDOW"},
    # (a) 1-row totals attach; CDF cumsum window over the ≤50-row bin
    # relation — corpus-scale work ended at the grouped bin count
    "ks_test_priority_totalprice": {"NESTED-LOOP", "GLOBAL-WINDOW"},
    # midrank cumsum window (and its feeding sort) over the same ≤500-row
    # bin relation as the KS CDF — corpus-scale work ended at the grouped
    # bin count
    "mannwhitney_urgent_totalprice": {"GLOBAL-WINDOW", "GLOBAL-SORT"},
    # 1-row bounds attach (min/max of both layout dimensions) broadcast
    # to the bucketing scan
    "zorder_skipping_effectiveness": {"NESTED-LOOP"},
    # 1-row total-rows attach broadcast to the <=distinct-QI-count band
    # relation
    "privacy_k_anonymity": {"NESTED-LOOP"},
    # broadcast n x k centroid grid (audit codebook capped at
    # _AUDIT_CENTS = 200 cells, corpus-independent) — the same bounded
    # scoring grid as the IVF family
    "emb_cluster_silhouette": {"NESTED-LOOP"},
    # 1-row total-revenue attach broadcast to the <=5-row channel rollup
    "last_touch_attribution": {"NESTED-LOOP"},
    # rank window + 1-row totals attach over the |sources|-bounded
    # (~20-row) token-mass relation — corpus-scale work ended at the
    # per-source token aggregate
    "token_source_concentration": {"GLOBAL-WINDOW", "NESTED-LOOP"},
    # broadcast probe-set grid (vec_id % 50 queries) against the corpus —
    # the same bounded scoring grid as emb_knn_join
    "emb_knn_label_audit": {"NESTED-LOOP"},
    # rank window + 13-wide self-join MA, both over the <=84-row month
    # relation — corpus-scale work ended at the monthly aggregate
    "seasonality_decomposition_revenue": {
        "GLOBAL-WINDOW",
        "GLOBAL-SORT",
        "NESTED-LOOP",
    },
    # broadcast n x k centroid grid (capped at _AUDIT_CENTS = 200 cells)
    # + per-cell stats attach — same bounded shapes as the
    # silhouette/IVF family
    "emb_outlier_distance": {"NESTED-LOOP"},
    # (b) 2-probe grid against the groups×bins-bounded cum relation
    # (cumsum window is PARTITIONED by group — no global window here)
    "quantile_sketch_by_priority": {"NESTED-LOOP"},
    # (a)+(b): 1-row query-vector attaches + the G×K (8×16) broadcast
    # ADC codebook grid — same bounded shapes as emb_pq_topk
    "emb_pq_trained_topk": {"NESTED-LOOP"},
    # same ADC grids twice (fixed + trained) + 1-row query attach; the
    # recall join is a 10-row broadcast semi-join
    "emb_pq_recall_compare": {"NESTED-LOOP"},
    # (a) 1-row n_queries / chosen-level attaches to the 4-row level
    # relation + (b) the 20-query × 25-centroid broadcast probe grid —
    # corpus-scale work is the assignment scan and the salted truth pass
    "emb_ivf_nprobe_autotune": {"NESTED-LOOP"},
    # (a) 1-row raw-token-total attach to the 4-row stage ledger —
    # corpus-scale work ended at the per-stage aggregates
    "doc_dedup_funnel": {"NESTED-LOOP"},
    # rank window (and its sort) over the vocabulary-bounded frequency
    # relation — corpus-scale work ended at the token-count aggregate
    "zipf_rank_frequency": {"GLOBAL-WINDOW", "GLOBAL-SORT"},
    # final frontier pass (window + output sort, sharing one exchange)
    # runs over the bucket-pruned ~log-size superset; the corpus-scale
    # window is the PARTITIONED phase-1 prune
    "pareto_frontier_orders": {"GLOBAL-WINDOW", "GLOBAL-SORT"},
}


def audit(plan: str) -> set[str]:
    flags: set[str] = set()
    if "CartesianProduct" in plan:
        flags.add("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.add("NESTED-LOOP")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0].strip()
        if "ASC" in first or "DESC" in first or first.startswith("specifiedwindowframe"):
            flags.add("GLOBAL-WINDOW")
    # a Sort fed by a SinglePartition exchange = the whole relation sorted
    # in ONE task (global orderBy parallelizes as Exchange rangepartitioning
    # instead; scalar-aggregate SinglePartition exchanges have no Sort above)
    if re.search(r"Sort \[[^\n]*\n\s*\+- Exchange SinglePartition", plan):
        flags.add("GLOBAL-SORT")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    from date_warehouse___airline_project_spark.session import get_spark
    import date_warehouse___airline_project_spark.plans as plans

    plans.load_all()
    spark = get_spark("plan-audit")
    bad = 0
    for name, q in plans.REGISTRY.items():
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {str(e).splitlines()[0][:100]}")
            bad += 1
            continue
        flags = audit(plan) - ALLOW.get(name, set())
        if flags:
            print(f"FLAG  {name}: {sorted(flags)}")
            bad += 1
    print(f"\n{len(plans.REGISTRY)} queries audited, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

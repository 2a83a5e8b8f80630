"""Scaling-sweep runner (SCALING.md): time the most expensive query
families at one scratch scale factor and append a JSON line to the
results file. One process per SF keeps sessions (and session-shared
memo caches) isolated, so every sweep point pays the same cold builds.

Usage: python tools/scaling_bench.py <sf_dir> <k> [results_path]

Query order is FIXED: within a session the first query of each dedup/ANN
family pays the shared memoized builds (token stream, pair bases, IVF
index), so a stable order makes per-query times comparable across sweep
points; family totals are robust regardless.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q1_pricing_summary",          # relational baseline (lineitem scan+agg)
    "quantile_sketch_totalprice",  # mergeable-histogram sketch
    "profile_drift_psi",           # PSI drift bins
    "basket_association_rules",    # per-basket pair generation
    "minhash_lsh_dupes",           # banded LSH (pays token-stream build)
    "simhash_dupes",               # vocabulary-relation simhash
    "ngram_jaccard_dupes",         # df-capped inverted index
    "doc_containment_pairs",       # shingle-containment
    "doc_neardup_greedy_keep",     # pair graph + greedy MIS
    "dedup_method_agreement",      # all three pair families (memo-shared)
    "doc_hashed_embedding_neardup",# feature-hash + sign-LSH
    "doc_curation_pipeline_v2",    # composed 4-stage pipeline
    "doc_curation_accounting_v2",  # its accounting twin
    "emb_ivf_indexed_topk",        # IVF lifecycle: train+write+probe
]


def main() -> None:
    sf_dir, k = sys.argv[1], int(sys.argv[2])
    results_path = (
        sys.argv[3] if len(sys.argv) > 3 else "scale_data/scaling_results.jsonl"
    )
    queries = sys.argv[4].split(",") if len(sys.argv) > 4 else QUERIES
    import __spark_entry__ as entry_mod
    from date_warehouse___airline_project_spark.session import get_spark

    spark = get_spark(f"scaling-k{k}")
    qs = entry_mod.queries()
    # warmup: JVM + Arrow worker spawn, not counted (docs-only sweep dirs
    # have no lineitem, so fall back to a documents scan there)
    if os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        entry_mod.plans.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).collect()
    else:
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    for name in queries:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  k={k} {name}: {timings[name]}s", file=sys.stderr)
    rec = {"k": k, "sf_dir": sf_dir, "total": round(sum(timings.values()), 3),
           "queries": timings}
    with open(results_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

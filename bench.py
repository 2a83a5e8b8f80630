"""Benchmark runner: executes every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (the driver captures only the TAIL of stdout and parses the
LAST line as JSON, so stdout carries exactly ONE compact JSON line):

  * stdout: compact summary (LAST and only line)
    {"metric": "total_query_wall_seconds", "value": total, "unit": "sec",
     "queries": {<headline subset>}, "sf": ...}
  * full per-query timing dict: written to bench_detail.json next to this
    file (the 132-entry dict overflowed the driver's tail capture in r01)

Materialization: queries whose result is a full-table projection are
evaluated through the noop sink (df.write.format("noop")) — unlike
``.count()``, the noop sink cannot let Catalyst prune computed columns out
of the plan, so the timing covers the full expression work. Small
aggregate/top-k results are ``.collect()``-ed (driver transfer is noise-free
at those sizes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Queries whose result is a full-table projection: benchmark via the noop
# sink (forces evaluation of every output column, no driver transfer).
_NOOP_SINK = {
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

# Headline queries included by name in the compact summary line (one per
# major family; the full dict lives in bench_detail.json).
_HEADLINE = [
    "q1_pricing_summary",
    "latest_order_per_customer",
    "minhash_lsh_dupes",
    "emb_ivf_trained_topk",
    "session_window_stats",
    "salted_join_supplier_volume",
    "doc_tfidf_top_terms",
    "scd2_dim_two_batches",
    "doc_release_manifest",
    "media_fuzzy_dedup",
]


def _tee_stderr(path: str) -> None:
    """Mirror fd 2 into ``path`` (JVM output included) while keeping it
    visible to the caller. The driver keeps only the TAIL of the combined
    output, which once truncated a mid-bench stack trace beyond diagnosis
    (BENCH_r03); the full stream now lands in bench_stderr.log."""
    import subprocess

    tee = subprocess.Popen(["tee", path], stdin=subprocess.PIPE, stdout=2)
    os.dup2(tee.stdin.fileno(), 2)


def _parse_reps() -> int:
    """Headline-repetition count: --reps N beats SPARK_GRAFT_BENCH_REPS
    beats the default 3. Parsed BEFORE any query runs — a malformed flag
    must fail fast, not after the full timed loop has already burned its
    wall time with the detail/summary still unwritten."""
    val = os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")
    if "--reps" in sys.argv:
        i = sys.argv.index("--reps")
        if i + 1 >= len(sys.argv):
            raise SystemExit("bench.py: --reps requires an integer value")
        val = sys.argv[i + 1]
    try:
        reps = int(val)
    except ValueError:
        raise SystemExit(f"bench.py: invalid reps value {val!r}") from None
    if reps < 1:
        raise SystemExit(f"bench.py: reps must be >= 1, got {reps}")
    return reps


def main() -> None:
    reps = _parse_reps()  # fail fast on a malformed flag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    _tee_stderr(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_stderr.log"))

    from date_warehouse___airline_project_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # warmup: JVM + parquet footer caches, plus one tiny Arrow/Python-UDF
    # round-trip so measured queries see warm Python workers (worker spawn
    # is a fixed per-session cost, not a per-query one). The whole span is
    # timed and reported as warmup_seconds in the detail (r12, per the r11
    # verdict: warmup is the one bucket outside value/all_in, so it must
    # be auditable — any future addition here shows up in that number).
    _warm_t0 = time.perf_counter()
    entry_mod.plans.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # Python Data Source lane warm-up (r11, guide §1.2 per-session
    # constants): the kafkalog reader's FIRST use pays the DataSource code
    # path's plan/worker spawn — a different lane than the pandas-UDF
    # workers warmed above (measured ~2.9 s on a 1-message topic, then
    # ~0.4 s steady). Same class of fixed per-session cost as the Arrow
    # round-trip, so it belongs in warmup, not billed to whichever topic
    # query runs first. Declared in OPTIMIZATION_r11.md with the old
    # warm_build numbers kept.
    from date_warehouse___airline_project_spark.session import session_tmpdir
    from date_warehouse___airline_project_spark.sources.kafka_log import (
        KafkaLogProducer,
        register_kafka_log_source,
    )

    _klog_warm = session_tmpdir("bench_klog_warm_")
    _klog_prod = KafkaLogProducer(_klog_warm, n_partitions=1)
    _klog_prod.send("warm", "{}")
    _klog_prod.close()
    register_kafka_log_source(spark)
    (
        spark.read.format("kafkalog")
        .option("path", _klog_warm)
        .option("subscribe", "warm")
        .load()
        .count()
    )
    warmup_seconds = round(time.perf_counter() - _warm_t0, 3)

    # Lifecycle queries build session-shared memoized artifacts (the three
    # dedup pair pipelines, the partitioned IVF index): run them ONCE
    # untimed so the timed loop measures steady-state per-query work
    # instead of billing the cold build to whichever query the round's
    # recert ordering happens to put first (r4: dedup_method_agreement
    # absorbed 21.5 s of shared builds). The build cost is still real and
    # still reported — separately, as warm_build_seconds in the detail.
    warm_build: dict[str, float] = {}
    for name in (
        "dedup_method_agreement",
        "emb_ivf_indexed_topk",
        "emb_ivf_cell_drift",  # builds its own drifted index copy
        "doc_release_incremental_update",  # writes the release state dir
        "emb_ivfpq_indexed_topk",  # r9: shares the session IVF-PQ index
        # (one build: emb_ivf_indexed_topk builds the PQ superset index,
        # this row's warm cost is just the search)
        "doc_release_backfill_applied",  # r10: writes the v1 shards and
        # executes the backfill rewrite against them (lifecycle), then the
        # timed run reads the manifest off the written files
        "state_growth_accounting",  # r10: builds its own takedown'd index
        # copy (tombstone set) once; the timed run is five 1-row folds
        "kafka_log_topic_stats",  # r11: produces the session topic once
        # (bounded driver-side append loop); the timed run is the
        # distributed kafkalog read + per-partition aggregate
    ):
        if name in qs:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            warm_build[name] = round(time.perf_counter() - t0, 3)

    # Memo-build attribution: session-memoized relations (pair sets, token
    # streams, trained codebooks) are built lazily by their FIRST consumer,
    # so per-query numbers shift with registry order (two r7 ">1.5x
    # regressions" were untouched code paying a newly-reordered build).
    # With instrumentation on, each memo miss materializes on its own
    # clock; the drained (label, seconds) land in memo_builds as their own
    # rows and are SUBTRACTED from the triggering query's row, so query
    # rows are comparable across rounds. value = queries + memo builds
    # (the true wall total, same metric as earlier rounds).
    from date_warehouse___airline_project_spark.operators.text_dedup import (
        drain_memo_timings,
        set_memo_instrumentation,
    )

    set_memo_instrumentation(True)
    memo_builds: dict[str, float] = {}

    def _drain_into(bucket: dict[str, float]) -> float:
        s = 0.0
        for lbl, sec in drain_memo_timings():
            bucket[f"memo:{lbl}"] = round(bucket.get(f"memo:{lbl}", 0.0) + sec, 3)
            s += sec
        return s

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name in _NOOP_SINK:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        dt = time.perf_counter() - t0
        dt -= _drain_into(memo_builds)
        timings[name] = round(max(dt, 0.0), 3)

    # Headline repetitions: the judged totals ride ONE full pass (value /
    # all_in unchanged), but single-run per-query numbers on this microVM
    # host swing 0.95-1.28x with no code change (BASELINE.md bracketing
    # note), so the headline subset is re-run reps-1 more times in steady
    # state and the summary reports per-query MEDIAN + [min, max] spread.
    # Override with --reps N or SPARK_GRAFT_BENCH_REPS (reps=1 restores
    # the old single-run line).
    rep_scratch: dict[str, float] = {}
    headline_runs: dict[str, list[float]] = {
        n: [timings[n]] for n in _HEADLINE if n in timings
    }
    for _ in range(max(reps - 1, 0)):
        for name in _HEADLINE:
            if name not in qs:
                continue
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            if name in _NOOP_SINK:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            # a memo rebuild cannot normally fire in steady state; drain
            # defensively so one never pollutes a rep
            dt -= _drain_into(rep_scratch)
            headline_runs[name].append(round(max(dt, 0.0), 3))
    import statistics

    headline_median = {
        n: round(statistics.median(v), 3) for n, v in headline_runs.items()
    }
    headline_spread = {
        n: [round(min(v), 3), round(max(v), 3)] for n, v in headline_runs.items()
    }

    memo_total = round(sum(memo_builds.values()), 3)
    total = round(sum(timings.values()) + memo_total, 3)
    # The round-comparable number: headline value PLUS the untimed warm
    # builds. The warm list moves real lifecycle work out of `value`, so
    # judging rounds on `value` alone mistakes a reclassification for a
    # speedup (r8 read as -2.8% when the all-in wall was +4.7%). The 2x
    # envelope is tracked on all_in_wall_seconds; growing the warm list
    # must be a visible, justified event (it changes warm_build_seconds,
    # not the envelope number).
    all_in = round(total + sum(warm_build.values()), 3)
    detail = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "all_in_wall_seconds": all_in,
        "queries": timings,
        "memo_builds": memo_builds,
        "memo_build_seconds": memo_total,
        "warm_build_seconds": warm_build,
        "warmup_seconds": warmup_seconds,
        "headline_reps": headline_runs,
        "headline_median": headline_median,
        "headline_spread": headline_spread,
        "reps": reps,
        "sf": float(sf),
        "n_queries": len(timings),
    }
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(repo_dir, "bench_detail.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    # Per-round snapshot so per-query regressions stay diffable after the
    # driver overwrites bench_detail.json next round. Round number = 1 +
    # highest BENCH_r{N}.json present. BENCH_r{N} is recorded strictly
    # AFTER bench output exists, so this stamp is right for BOTH the
    # builder's in-round runs AND the driver's end-of-round run — unlike
    # the old CORRECTNESS_r* key, which the driver writes BEFORE running
    # bench (that skew landed the r5 driver detail as r06).
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    rnd = (max(rounds) + 1) if rounds else 1
    with open(os.path.join(repo_dir, f"bench_detail_r{rnd:02d}.json"), "w") as f:
        json.dump(detail, f, indent=1)
    # Compact summary as the ONLY stdout line — must stay well under the
    # driver's tail-capture window, so only a headline subset of queries.
    summary = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "all_in_wall_seconds": all_in,
        # median-of-reps: single-run numbers swing with host load (the
        # per-run lists live in the detail's headline_reps)
        "queries": headline_median,
        "queries_spread": headline_spread,
        "reps": reps,
        "sf": float(sf),
        "n_queries": len(timings),
        "detail": "bench_detail.json",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

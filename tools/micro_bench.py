"""Focused re-timing of a query subset, same methodology as bench.py
(noop sink for the bench's _NOOP_SINK set, collect otherwise; memo
instrumentation on so shared builds land on their own clock).

Usage: python tools/micro_bench.py [--reps N] <query> [query ...]

Prints per-query median + [min,max] over N reps (default 5) after one
untimed warm pass. Reads $SPARK_GRAFT_SF_DIR like bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)


def main() -> int:
    args = sys.argv[1:]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from date_warehouse___airline_project_spark.session import get_spark
    from date_warehouse___airline_project_spark import plans
    from date_warehouse___airline_project_spark.operators.text_dedup import (
        drain_memo_timings,
        set_memo_instrumentation,
    )
    import bench

    plans.load_all()
    spark = get_spark("micro_bench")
    # same warmup as bench.py
    plans.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    set_memo_instrumentation(True)

    results: dict[str, dict] = {}
    for name in names:
        fn = plans.REGISTRY[name].fn
        memo_cost = 0.0
        runs: list[float] = []
        for r in range(reps + 1):  # rep 0 is the untimed warm pass
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if name in bench._NOOP_SINK:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            drained = sum(s for _, s in drain_memo_timings())
            if r == 0:
                memo_cost = drained
            else:
                runs.append(max(dt - drained, 0.0))
        results[name] = {
            "median": round(statistics.median(runs), 3),
            "spread": [round(min(runs), 3), round(max(runs), 3)],
            "first_pass_memo_s": round(memo_cost, 3),
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

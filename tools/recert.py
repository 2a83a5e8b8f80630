"""Mechanical re-certification detector.

A query's driver-green CORRECTNESS row certifies ONE behavior. If the
query's plan or its oracle text changes in a later round, that row is
stale — the r03 simhash blocking change rode a round-1 green row, which a
regression would also have done. This tool makes staleness detection
mechanical instead of hand-curated:

  fingerprint(query) = sha256( normalized analyzed-plan string at sf0.001
                               + "\\0" + oracle SQL text )

``python tools/recert.py``            recompute fingerprints, diff against
                                      the committed tools/plan_hashes.json,
                                      write the changed/new names to
                                      tools/recert_list.json, and refresh
                                      plan_hashes.json.
``python tools/recert.py --check``    diff only (no file writes), exit 1
                                      if anything changed.

__spark_entry__ reads recert_list.json: every name in it is treated as
UNcertified (re-enters the driver's 50-query window) regardless of old
green rows. The workflow per round: change code → run tools/recert.py →
commit both JSON files; the entry module does the rest.

Plan strings are normalized before hashing (expression IDs, temp paths,
checkpoint/in-memory RDD ids are nondeterministic across sessions):
two runs in fresh sessions must produce identical fingerprints — enforced
by tests/test_entry.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HASHES_PATH = os.path.join(REPO, "tools", "plan_hashes.json")
RECERT_PATH = os.path.join(REPO, "tools", "recert_list.json")
FINGERPRINT_SF_DIR = "/root/testdata/sf0.001"

_NORMALIZERS = [
    # Catalyst expression IDs: colname#1234 / #1234L
    (re.compile(r"#\d+"), "#"),
    # PySpark higher-order-function lambda variables carry a per-process
    # counter (lambda x_3 vs lambda x_290) — pure session state
    (re.compile(r"\blambda ([A-Za-z]+)_\d+"), r"lambda \1_"),
    # temp dirs (IVF index builds, checkpoints)
    (re.compile(r"/tmp/[^\s,)\]]+"), "/tmp/X"),
    # RDD / plan ids embedded by localCheckpoint & InMemoryRelation
    (re.compile(r"\bLogicalRDD\b[^\n]*"), "LogicalRDD"),
    (re.compile(r"\bExistingRDD\b[^\n]*"), "ExistingRDD"),
    (re.compile(r"\bcachedPlan=[^\n]*"), "cachedPlan"),
    # run-to-run varying statistics annotations
    (re.compile(r"Statistics\([^)]*\)"), "Statistics"),
    (re.compile(r"[ \t]+"), " "),
]


def normalize_plan(plan: str) -> str:
    for rx, rep in _NORMALIZERS:
        plan = rx.sub(rep, plan)
    return plan.strip()


def _fn_sources(fn) -> str:
    """Source of the query fn plus (one level deep) every same-module
    function it references. Catches behavior that never reaches the plan
    string: driver-side folds over collected bounded relations (e.g. the
    MMR greedy loop's arithmetic helpers) appear as a LocalRelation in the
    plan, so only their Python source can witness a change."""
    import inspect

    srcs = [inspect.getsource(fn)]
    mod = sys.modules.get(fn.__module__)
    for name in fn.__code__.co_names:
        obj = getattr(mod, name, None)
        if inspect.isfunction(obj) and obj.__module__ == fn.__module__:
            try:
                srcs.append(inspect.getsource(obj))
            except OSError:  # pragma: no cover
                pass
    return "\n".join(srcs)


def fingerprint_one(spark, q, sf_dir: str = FINGERPRINT_SF_DIR) -> str:
    df = q.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()
    payload = "\0".join([normalize_plan(plan), q.oracle or "", _fn_sources(q.fn)])
    return hashlib.sha256(payload.encode()).hexdigest()


def compute_fingerprints() -> dict[str, str]:
    # Full lineage, not checkpoint-truncated LogicalRDDs (see _materialize)
    os.environ["SPARK_GRAFT_PLAN_FINGERPRINT"] = "1"

    from date_warehouse___airline_project_spark import plans
    from date_warehouse___airline_project_spark.session import get_spark

    plans.load_all()
    spark = get_spark("recert")
    # Plan strings truncate expression lists at spark.sql.debug.
    # maxToStringFields (default 25) — a 48-column aggregate change hashed
    # IDENTICAL under the default because the changed columns were elided
    # as "... N more fields". Fingerprints must see the whole tree.
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    out: dict[str, str] = {}
    for name, q in plans.REGISTRY.items():
        try:
            out[name] = fingerprint_one(spark, q)
        except Exception as exc:  # a broken plan must surface, not hide
            out[name] = f"ERROR:{type(exc).__name__}:{exc}"
    return out


def diff(old: dict[str, str], new: dict[str, str]) -> list[str]:
    """Names whose fingerprint changed or is new. Removed names drop out
    of the registry (and the window) by themselves."""
    return sorted(n for n, h in new.items() if old.get(n) != h)


def latest_green(repo: str = REPO) -> set[str]:
    """Names green in the HIGHEST-numbered CORRECTNESS_r{N}.json."""
    import glob

    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not paths:
        return set()
    with open(paths[-1]) as f:
        rows = json.load(f)
    return {
        n
        for n, r in rows.items()
        if r.get("err") is None
        and r.get("rows_match")
        and r.get("hash_match") is not False
    }


def carry_over(old_recert: list[str], changed: list[str], green: set[str],
               registry: set[str]) -> list[str]:
    """Next recert list: newly-changed names, plus prior entries that have
    NOT yet landed a fresh green driver row since entering the list."""
    keep = [n for n in old_recert if n in registry and n not in green]
    return sorted(set(changed) | set(keep))


def main() -> None:
    check_only = "--check" in sys.argv
    old: dict[str, str] = {}
    if os.path.exists(HASHES_PATH):
        with open(HASHES_PATH) as f:
            old = json.load(f)
    new = compute_fingerprints()
    # First run ever: the hashes file IS the baseline — queries keep their
    # existing green rows (their behavior at baseline is what those rows
    # certified as of this commit); only subsequent drift re-windows them.
    changed = diff(old, new) if old else []
    old_recert: list[str] = []
    if os.path.exists(RECERT_PATH):
        with open(RECERT_PATH) as f:
            old_recert = json.load(f)
    recert = carry_over(old_recert, changed, latest_green(), set(new))
    errors = [n for n, h in new.items() if h.startswith("ERROR:")]
    print(f"{len(new)} queries fingerprinted, {len(changed)} changed/new, "
          f"{len(recert)} to re-certify, {len(errors)} errored")
    for n in recert:
        print(f"  recert: {n}")
    for n in errors:
        print(f"  ERROR : {n} -> {new[n][:120]}")
    if not check_only:
        with open(HASHES_PATH, "w") as f:
            json.dump(new, f, indent=1, sort_keys=True)
        with open(RECERT_PATH, "w") as f:
            json.dump(recert, f, indent=1)
        print(f"wrote {HASHES_PATH} and {RECERT_PATH}")
    elif changed:
        sys.exit(1)


if __name__ == "__main__":
    main()

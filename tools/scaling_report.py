"""Compute per-family scaling exponents from the sweep results
(tools/scaling_bench.py output) and print the SCALING.md tables.

Exponent = least-squares slope of log(time) vs log(k) over all sweep
points (averaged across repetitions at the same k). Also prints the
marginal k5→k10 exponent — the closest thing to an asymptotic estimate
the sweep offers, since small-k points are overhead-dominated.
"""

from __future__ import annotations

import json
import math
import sys
from collections import defaultdict


def load(paths: list[str]) -> dict[int, list[dict[str, float]]]:
    by_k: dict[int, list[dict[str, float]]] = defaultdict(list)
    for p in paths:
        for line in open(p):
            r = json.loads(line)
            by_k[r["k"]].append(r["queries"])
    return by_k


def table(by_k: dict[int, list[dict[str, float]]]) -> None:
    ks = sorted(by_k)
    names = list(by_k[ks[0]][0])
    mean = {
        k: {n: sum(q[n] for q in runs) / len(runs) for n in names}
        for k, runs in by_k.items()
    }
    hdr = " | ".join(f"k={k}" for k in ks)
    print(f"| query | {hdr} | fit exp | k5→k10 exp |")
    print("| --- |" + " --- |" * (len(ks) + 2))
    for n in names:
        ts = [mean[k][n] for k in ks]
        xs = [math.log(k) for k in ks]
        ys = [math.log(t) for t in ts]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        marg = (
            math.log(mean[10][n] / mean[5][n]) / math.log(2)
            if 5 in mean and 10 in mean
            else float("nan")
        )
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| `{n}` | {cells} | {b:+.2f} | {marg:+.2f} |")
    tots = [sum(mean[k][n] for n in names) for k in ks]
    cells = " | ".join(f"{t:.1f}" for t in tots)
    overall = math.log(tots[-1] / tots[0]) / math.log(ks[-1] / ks[0])
    print(f"| **total** | {cells} | {overall:+.2f} | |")


if __name__ == "__main__":
    table(load(sys.argv[1:]))

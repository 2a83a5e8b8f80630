"""LSH banding parameter selection (the standard S-curve analysis).

For MinHash-LSH with ``b`` bands of ``r`` rows (k = b*r signature width),
the probability that a pair with true similarity ``s`` becomes a
candidate is ``1 - (1 - s^r)^b`` — an S-curve whose midpoint sits near
``(1/b)^(1/r)``. Choosing (b, r) is choosing where the curve's jump
lands relative to the dedup threshold: too low wastes verify work on
junk pairs (false candidates), too high loses true near-dups before the
verify can see them (false misses are UNRECOVERABLE — the verify only
sees candidates, which is why the repo biases the curve BELOW the
threshold).

Pure driver-side math over a handful of integers — this never touches
data; it sizes the plan the data will run.
"""

from __future__ import annotations


def collision_probability(s: float, bands: int, rows: int) -> float:
    """P(candidate) for a pair with true jaccard ``s`` under (b, r) LSH."""
    return 1.0 - (1.0 - s**rows) ** bands


def curve_midpoint(bands: int, rows: int) -> float:
    """Similarity at which the S-curve crosses ~0.5: (1/b)^(1/r)."""
    return (1.0 / bands) ** (1.0 / rows)


def lsh_params(threshold: float, k: int, recall_bias: float = 0.85) -> tuple[int, int]:
    """Pick (bands, rows) with b*r == k whose S-curve midpoint is closest
    to ``recall_bias * threshold`` (below the threshold: a false miss is
    unrecoverable, a false candidate just costs one exact verify).

    Returns (bands, rows). For the repo's defaults (threshold=0.5, k=16)
    this lands on b=4, r=4 (midpoint 0.71 is rejected for recall;
    b=8, r=2 midpoint 0.35 wins at the biased target 0.425).
    """
    target = recall_bias * threshold
    best: tuple[float, int, int] | None = None
    for rows in range(1, k + 1):
        if k % rows:
            continue
        bands = k // rows
        err = abs(curve_midpoint(bands, rows) - target)
        if best is None or err < best[0]:
            best = (err, bands, rows)
    assert best is not None
    return best[1], best[2]

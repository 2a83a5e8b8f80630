"""Z-order (Morton-curve) clustered writes — multi-dimensional data layout.

A table sorted on one column prunes scans on that column only: parquet
row-group/file min-max stats are tight on the sort key and useless on
everything else. Interleaving the bits of TWO (or more) normalized
columns into one Morton code and range-writing on that code makes every
file a small hyper-rectangle in the combined key space — min-max stats
stay tight on EVERY participating column, so a filter on any of them
prunes files. This is the standard lakehouse layout optimization for
multi-dimensional access patterns; at 100 TB it is the difference
between scanning one dimension's worth of files and scanning everything.

Normalization here is range-based (``width_bucket`` over the observed
min/max into 2^bits buckets): fully deterministic, one tiny aggregate to
fetch the bounds, no sampling. Heavily skewed columns would crowd into
few buckets — for those, substitute a rank/quantile bucketing (the
Morton interleave below is unchanged); the synthetic uniform keys this
repo tests on don't need it.

Everything is column arithmetic (shiftleft/bitwise OR over codegen'd
exprs) plus ONE repartitionByRange shuffle — no UDFs, no driver-side
data movement beyond the 2-row bounds collect.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each already-bucketed column (values in
    [0, 2^bits)) into one Morton code. Column i contributes bit b to
    output position ``b * ncols + i`` — the canonical bit-interleave."""
    ncols = len(bucket_cols)
    parts = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
        )
        for i, c in enumerate(bucket_cols)
        for b in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("_z")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Morton code of ``cols``.

    One bounds aggregate (2 values per column, collected — bounded by
    ncols, never data), one range shuffle on the code, one in-partition
    sort; each output file covers a compact region of every clustered
    column, which the test suite verifies via per-file min-max spans.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    nbuckets = 1 << bits
    bucketed = []
    for c in cols:
        lo, hi = float(bounds[f"_lo_{c}"]), float(bounds[f"_hi_{c}"])
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit(nbuckets - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * nbuckets),
        ).cast("long")
        bucketed.append(b)
    (
        df.withColumn("_z", morton_code(bucketed, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

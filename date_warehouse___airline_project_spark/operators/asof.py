"""As-of (backward) join — an operator the reference lacks entirely but
any time-series warehouse user expects (DuckDB ships it as ``ASOF JOIN``).

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` within the same key group. Implemented with the
union-tag trick — NO per-key loop, NO range explosion:

  1. tag right rows side=0 and left rows side=1, union them;
  2. one window per key ordered by (ts, side, tiebreak) carries the last
     non-null right payload forward (``last(..., ignorenulls=True)`` over
     an unbounded-preceding frame);
  3. keep the left rows, unpack the matched payload.

Cost model: one shuffle on the join key, then a partition-local sort —
identical asymptotics to a sort-merge join, and the key-partitioned
window parallelizes across executors at any scale (no global ordering is
ever required). Ties at equal ``ts``: right rows sort BEFORE left rows
(side 0 < 1) so an exact-timestamp match is taken, matching DuckDB's
``ON left.ts >= right.ts`` semantics; among equal-ts right rows the
caller's ``right_tiebreak`` picks the winner deterministically (last one
in ascending order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: left rows + most recent right payload.

    ``payload_cols`` are the right-side columns to attach (renamed with
    ``suffix``). Unmatched left rows keep null payloads (LEFT ASOF JOIN).
    """
    tiebreak = right_tiebreak or []
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(f"_tb_{c}") for c in tiebreak],
        payload.alias("_asof_payload"),
        F.lit(0).alias("_asof_side"),
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    # Align schemas for the union: left gets null tiebreaks/payload,
    # right gets null left-only columns.
    for c in left_cols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    l = l.withColumn("_asof_payload", F.lit(None).cast(r.schema["_asof_payload"].dataType))
    for c in tiebreak:
        l = l.withColumn(f"_tb_{c}", F.lit(None).cast(right.schema[c].dataType))
    cols = on + ["_asof_ts", "_asof_side", "_asof_payload"] + [f"_tb_{c}" for c in tiebreak] + [
        c for c in left_cols if c not in on
    ]
    unioned = r.select(*cols).unionByName(l.select(*cols))

    order: list[Column] = [F.col("_asof_ts"), F.col("_asof_side")]
    order += [F.col(f"_tb_{c}") for c in tiebreak]
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    matched = unioned.withColumn("_m", F.last("_asof_payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("_asof_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out

"""Dedup operators (SURVEY §2.4 A3/A4/A5, §2.5 W2).

The reference *quarantines* duplicates rather than dropping them, so every
dedup here returns both sides (via a marker column) instead of Spark's
lossy ``dropDuplicates``. keep='first' is deterministic via the ingest
order column (see operators/order.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .order import INGEST_COL, with_ingest_order

DUPE_COL = "_is_dupe"


def mark_keyed_dupes(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Add ``_is_dupe``: true for every row after the first per key group
    (keys=None → exact-row dedup over all columns).

    One shuffle on the dedup key; at scale this is the canonical
    hash-partition + per-group row_number plan.
    """
    if INGEST_COL not in df.columns:
        df = with_ingest_order(df)
    key_cols = list(keys) if keys else [c for c in df.columns if c != INGEST_COL]
    w = W.partitionBy(*key_cols).orderBy(INGEST_COL)
    return df.withColumn(DUPE_COL, F.row_number().over(w) > 1)


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Return (kept, dupes) with keep='first' in ingest order."""
    marked = mark_keyed_dupes(df, keys)
    kept = marked.filter(~F.col(DUPE_COL)).drop(DUPE_COL)
    dupes = marked.filter(F.col(DUPE_COL)).drop(DUPE_COL)
    return kept, dupes


def duplicate_groups(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """Enumerate duplicate groups: key cols + occurrence count + the list of
    ids involved (reference functions.py:359-376 returns index pairs; the
    grouped form is the scalable equivalent — pair enumeration is quadratic
    in group size and materialized only per group here)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_dupes"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n_dupes") > 1)
    )

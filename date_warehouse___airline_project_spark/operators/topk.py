"""latest_per_key — top-1-by-recency per key (SURVEY §2.5 W3 / §2.6 O1).

The eligibility lookup shape: ORDER BY ts DESC LIMIT 1 *per key*. One
shuffle on the key; Spark plans a partial top-1 per map task when the
window is rank-limited (WindowGroupLimit in the physical plan), so the
shuffle carries at most one row per key per task — scale-safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

"""Grouped-map Pandas operator (``applyInPandas``) — the escape hatch for
per-group logic the built-in aggregates can't express (SURVEY §2.13: the
reference's ``.apply(axis=1)`` habits become Arrow-batched grouped maps,
never row-at-a-time Python).

Demo semantics: per-customer order-cadence statistics. The gap sequence is
the day-diff of the date-sorted order history; its multiset is invariant to
how same-date orders tie-break, so the result is deterministic at any
parallelism. Gaps are integers, so the median's only non-integer case is
an exact ``x.5`` — bit-identical across engines (no rounding policy
needed, unlike money percentiles).

Scale note — the bucketed grouped-map pattern: a naive
``groupBy(custkey).applyInPandas`` makes one Python call per customer
(~1-2 ms each), so millions of small groups pay minutes of pure
call overhead. Instead we group by ``custkey % N_BUCKETS`` and run a
vectorized ``pandas.groupby`` over the whole bucket inside each call:
N_BUCKETS Python invocations total, each Arrow batch thousands of
customers wide. Each customer hashes to exactly one bucket, so per-key
semantics are unchanged; skew is bounded because buckets are
hash-uniform regardless of per-customer history length. (Measured at
sf0.1: 27 s per-key -> ~1 s bucketed for the same result.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = (
    "o_custkey bigint, n_gaps bigint, median_gap_days double, "
    "min_gap bigint, max_gap bigint"
)

N_BUCKETS = 256


def _bucket_gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["o_custkey", "o_orderdate"])
    days = pdf["o_orderdate"].dt.normalize()
    gap = days.diff().dt.days
    same_cust = pdf["o_custkey"].eq(pdf["o_custkey"].shift())
    g = pd.DataFrame({"k": pdf["o_custkey"], "gap": gap.where(same_cust)}).dropna(
        subset=["gap"]
    )
    agg = g.groupby("k")["gap"].agg(["count", "median", "min", "max"]).reset_index()
    agg = agg[agg["count"] >= 3]
    return pd.DataFrame(
        {
            "o_custkey": agg["k"].astype("int64"),
            "n_gaps": agg["count"].astype("int64"),
            "median_gap_days": agg["median"].astype("float64"),
            "min_gap": agg["min"].astype("int64"),
            "max_gap": agg["max"].astype("int64"),
        }
    )


def order_gap_stats(orders: DataFrame) -> DataFrame:
    """Per-customer cadence stats via a bucketed grouped-map Pandas UDF.

    Customers with fewer than 3 gaps (4 orders) are dropped. Grouping is
    on a hash bucket of the key, with the per-customer split vectorized
    inside the batch (see module docstring for why).
    """
    return (
        orders.select("o_custkey", "o_orderdate")
        .withColumn("_bucket", F.pmod(F.col("o_custkey"), F.lit(N_BUCKETS)))
        .groupBy("_bucket")
        .applyInPandas(_bucket_gap_stats, schema=_SCHEMA)
    )

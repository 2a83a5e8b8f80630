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

Scale note: applyInPandas shuffles on the group key and streams one Arrow
batch per group through a reused Python worker. Groups here are customer
order histories (tiny); the 100 TB risk is a single giant group, which
this operator's semantics cap naturally.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

_SCHEMA = (
    "o_custkey bigint, n_gaps bigint, median_gap_days double, "
    "min_gap bigint, max_gap bigint"
)


def _gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    days = pdf.sort_values("o_orderdate")["o_orderdate"].dt.normalize()
    gaps = days.diff().dt.days.dropna()
    if len(gaps) < 3:
        return pd.DataFrame(columns=_SCHEMA.split(", "))[[]].reindex(
            columns=["o_custkey", "n_gaps", "median_gap_days", "min_gap", "max_gap"]
        )
    return pd.DataFrame(
        {
            "o_custkey": [int(pdf["o_custkey"].iloc[0])],
            "n_gaps": [int(len(gaps))],
            "median_gap_days": [float(gaps.median())],
            "min_gap": [int(gaps.min())],
            "max_gap": [int(gaps.max())],
        }
    )


def order_gap_stats(orders: DataFrame) -> DataFrame:
    """Per-customer cadence stats via a grouped-map Pandas UDF."""
    return (
        orders.select("o_custkey", "o_orderdate")
        .groupBy("o_custkey")
        .applyInPandas(_gap_stats, schema=_SCHEMA)
    )

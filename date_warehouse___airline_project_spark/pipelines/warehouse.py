"""Warehouse layering: staging → prefact → dim (SCD2) → fact.

The reference declares this flow in config (table_configs.json:2-12:
``staging_booking_sales → prefact_booking_sales → dim_booking_sales →
fact_booking_sales``, natural key ``booking_reference``, scdType 2,
per-layer on_conflict keys) and delegates execution to an out-of-repo
stored procedure (``start_passenger_etl_pipeline``, cleaners/__init__.py:
45-64). These semantics are implemented here from the config, Spark-first.

Layer contracts:
  staging   all-string rows as ingested (CSV semantics)
  prefact   typed + deduped on the natural key (keep-first in ingest order)
  dim       SCD2 effective-dated versions (operators/scd2.py) + a
            deterministic surrogate key ``<subject>_sk`` = md5(natural key
            ‖ valid_from) — reproducible under re-runs, no sequence state
            (sequences don't distribute; hash surrogates do)
  fact      measures + the CURRENT dim surrogate resolved by equi-join on
            the natural key (broadcast when the dim is small)

At scale: every step is a narrow projection or a single keyed shuffle;
SCD2 re-merge shuffles only on the natural key. The dim is rewritten per
batch (it is versioned truth, dims are small relative to facts); facts
append.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_keep_first
from ..operators.order import INGEST_COL, with_ingest_order
from ..operators.scd2 import scd2_init, scd2_merge


@dataclass(frozen=True)
class WarehouseConfig:
    """Mirror of the reference's per-subject table config."""

    subject: str
    natural_key: Sequence[str]
    tracked: Sequence[str]  # SCD2-tracked dimension attributes
    measures: Sequence[str] = field(default_factory=tuple)  # fact columns
    # column -> cast type for the typing layer (e.g. {"ticketprice": "decimal(10,2)"})
    type_map: Mapping[str, str] = field(default_factory=dict)


def stage_to_prefact(staging: DataFrame, cfg: WarehouseConfig) -> DataFrame:
    """Type the staged strings and dedup on the natural key (keep-first)."""
    df = with_ingest_order(staging)
    for col, dtype in cfg.type_map.items():
        if col in df.columns:
            df = df.withColumn(col, F.col(col).cast(dtype))
    kept, _dupes = dedup_keep_first(df, list(cfg.natural_key))
    return kept.drop(INGEST_COL)


def _surrogate(cfg: WarehouseConfig) -> Column:
    parts: list[Column] = []
    for k in cfg.natural_key:
        parts += [F.coalesce(F.col(k).cast("string"), F.lit("")), F.lit("|")]
    parts.append(F.date_format("_valid_from", "yyyy-MM-dd HH:mm:ss"))
    return F.md5(F.concat(*parts))


def prefact_to_dim(
    dim: DataFrame | None, prefact: DataFrame, cfg: WarehouseConfig, batch_ts: str
) -> DataFrame:
    """SCD2-merge the batch into the dimension; attach surrogate keys."""
    updates = prefact.select(*cfg.natural_key, *cfg.tracked)
    sk = f"{cfg.subject}_sk"
    if dim is None:
        merged = scd2_init(updates, batch_ts)
    else:
        merged = scd2_merge(dim.drop(sk), updates, cfg.natural_key, cfg.tracked, batch_ts)
    return merged.withColumn(sk, _surrogate(cfg))


def dim_to_fact(prefact: DataFrame, dim: DataFrame, cfg: WarehouseConfig) -> DataFrame:
    """Fact rows = natural key + measures + current dim surrogate key.

    Left join keeps facts whose dim row is missing (null SK → late-arriving
    dimension, the standard treatment); the current-version slice of a dim
    is small, so Spark broadcast-plans this join under AQE.
    """
    sk = f"{cfg.subject}_sk"
    current = dim.filter(F.col("_is_current")).select(*cfg.natural_key, sk)
    facts = prefact.select(*cfg.natural_key, *cfg.measures)
    return facts.join(current, list(cfg.natural_key), "left")


def run_batch(
    staging: DataFrame, dim: DataFrame | None, cfg: WarehouseConfig, batch_ts: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One warehouse batch: returns (prefact, new_dim, fact)."""
    prefact = stage_to_prefact(staging, cfg)
    new_dim = prefact_to_dim(dim, prefact, cfg, batch_ts)
    fact = dim_to_fact(prefact, new_dim, cfg)
    return prefact, new_dim, fact

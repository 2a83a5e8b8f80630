"""scd2_merge — Slowly-Changing-Dimension Type 2 effective-dated merge
(SURVEY §2.3 J4, §1.3; reference table_configs.json:2-12 declares scdType 2
with per-layer on_conflict keys; the actual merge lived in an out-of-repo
stored procedure, so these semantics are implemented from the config).

No Delta in this image, so MERGE is emulated with joins + union — the
logical plan is identical to what ``MERGE INTO`` would produce: one shuffle
of each side on the natural key.

Dimension schema contract: natural key + tracked attributes +
  _valid_from timestamp, _valid_to timestamp (null = open), _is_current bool.

Invariants (property-tested):
  * re-running the same batch is a no-op
  * a changed attribute closes the old version (valid_to = batch_ts) and
    opens a new current version
  * at most one current row per natural key
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("_valid_from", "_valid_to", "_is_current")


def scd2_init(updates: DataFrame, batch_ts: str) -> DataFrame:
    """First load: every row becomes an open current version."""
    return (
        updates.withColumn("_valid_from", F.lit(batch_ts).cast("timestamp"))
        .withColumn("_valid_to", F.lit(None).cast("timestamp"))
        .withColumn("_is_current", F.lit(True))
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    natural_key: Sequence[str],
    tracked: Sequence[str],
    batch_ts: str,
) -> DataFrame:
    """Merge ``updates`` (natural_key + tracked attrs) into the SCD2 ``dim``.

    Returns the new full dimension. Plan shape: updates ⋈ current-rows on
    the natural key (one shuffle each side, or broadcast when updates are
    small), split into changed/unchanged/new via a null-safe attribute
    comparison, then union of [history, closed old versions, surviving
    current rows, new versions].
    """
    key = list(natural_key)
    cols = dim.columns

    current = dim.filter(F.col("_is_current"))
    history = dim.filter(~F.col("_is_current"))

    up = updates.select(key + list(tracked)).dropDuplicates(key)
    cur_k = current.select([F.col(c).alias(f"_cur_{c}") for c in key + list(tracked)])
    join_cond = [F.col(k) == F.col(f"_cur_{k}") for k in key]
    joined = up.join(cur_k, join_cond, "left")

    matched = F.col(f"_cur_{key[0]}").isNotNull()
    # null-safe "any tracked attribute differs"
    changed_pred = F.lit(False)
    for t in tracked:
        changed_pred = changed_pred | ~F.col(t).eqNullSafe(F.col(f"_cur_{t}"))

    new_keys = joined.filter(~matched).select(key + list(tracked))
    changed = joined.filter(matched & changed_pred).select(key + list(tracked))
    changed_key_rows = changed.select(key)

    # close old versions of changed keys
    closed = (
        current.join(changed_key_rows, key, "left_semi")
        .withColumn("_valid_to", F.lit(batch_ts).cast("timestamp"))
        .withColumn("_is_current", F.lit(False))
    )
    surviving = current.join(changed_key_rows, key, "left_anti")

    opened = scd2_init(new_keys.unionByName(changed), batch_ts)
    # carry any non-tracked payload columns as nulls if dim has extras
    for c in cols:
        if c not in opened.columns:
            opened = opened.withColumn(c, F.lit(None))
    opened = opened.select(cols)

    return history.select(cols).unionByName(closed.select(cols)).unionByName(
        surviving.select(cols)
    ).unionByName(opened)


def scd2_point_in_time(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_ts: str,
    dim_key: str,
    tracked: Sequence[str],
    prefix: str = "",
) -> DataFrame:
    """Resolve each fact row to the dim VERSION valid at its event time:
    equi-join on the natural key (that join carries the shuffle), the
    effective-date range as a post-join filter, LEFT so a fact whose dim
    row doesn't exist yet — the late-arriving-dimension case — survives
    with null attributes instead of disappearing."""
    d = dim.select(
        F.col(dim_key).alias("_dk"),
        "_valid_from",
        "_valid_to",
        *[F.col(c).alias(f"{prefix}{c}") for c in tracked],
    )
    cond = (
        (F.col(fact_key) == F.col("_dk"))
        & (F.col(fact_ts) >= F.col("_valid_from"))
        & (F.col("_valid_to").isNull() | (F.col(fact_ts) < F.col("_valid_to")))
    )
    return (
        facts.join(d, cond, "left")
        .withColumn(f"{prefix}_resolved", F.col("_dk").isNotNull())
        .drop("_dk", "_valid_from", "_valid_to")
    )


def scd2_reconcile(
    facts: DataFrame,
    dim_old: DataFrame,
    dim_new: DataFrame,
    fact_key: str,
    fact_ts: str,
    dim_key: str,
    tracked: Sequence[str],
) -> DataFrame:
    """Late-arriving-dimension reconciliation: facts whose event-time dim
    version CHANGED between two dim states (a correction or late dim row
    landing after the facts were loaded).

    Each fact is point-in-time-resolved against both states (two key
    equi-joins — the range predicates are post-join filters, never a
    fact-side BNLJ); rows where any tracked attribute differs null-safely
    survive, tagged:

    - ``late_dim_arrival``  — no version at event time in the old state,
      one exists now (the dim row arrived after the fact)
    - ``dim_version_lost``  — resolved before, unresolved now (a
      retroactive effective-date moved past the fact)
    - ``retro_correction``  — resolved in both, attribute(s) differ

    Output = fact columns + ``old_<attr>`` / ``new_<attr>`` + change_type.
    """
    resolved = scd2_point_in_time(
        scd2_point_in_time(
            facts, dim_old, fact_key, fact_ts, dim_key, tracked, "old_"
        ),
        dim_new,
        fact_key,
        fact_ts,
        dim_key,
        tracked,
        "new_",
    )
    changed = ~F.col("old__resolved").eqNullSafe(F.col("new__resolved"))
    for c in tracked:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    return (
        resolved.filter(changed)
        .withColumn(
            "change_type",
            F.when(
                ~F.col("old__resolved") & F.col("new__resolved"),
                "late_dim_arrival",
            )
            .when(
                F.col("old__resolved") & ~F.col("new__resolved"),
                "dim_version_lost",
            )
            .otherwise("retro_correction"),
        )
        .drop("old__resolved", "new__resolved")
    )

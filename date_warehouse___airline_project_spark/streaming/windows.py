"""Watermarked event-time window aggregations (streaming form).

The reference's streaming layer has no watermarks, windows, or stateful
aggregation (SURVEY §2.12 gap note); these supply them. The aggregation
expressions are the SAME as the batch queries in plans/event_windows.py —
one logical plan, two execution modes — so the DuckDB-oracle checks on the
batch form certify the streaming arithmetic, and streaming tests only need
to certify the mode mechanics (watermark advance, append emission).

Late-data policy: events older than the watermark delay are dropped by the
engine; with append output mode a window emits exactly once, after the
watermark passes its end — at 100 TB this bounds state to
(windows in flight) × (group cardinality), the standard design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-type counts/sums under a watermark.

    ``events`` may be streaming or batch; watermarks are a no-op in batch
    mode, so the same function serves both.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_stream_followup_join(
    purchases: DataFrame,
    errors: DataFrame,
    watermark: str = "30 minutes",
    max_lag_minutes: int = 15,
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    errors occurring within ``max_lag_minutes`` AFTER it.

    The reference has no stream-stream joins at all (SURVEY §2.12 gap);
    this is the canonical Structured Streaming form: watermarks on BOTH
    sides plus a bounded event-time range condition, which lets the engine
    expire join state — state size is (events within the lag window), not
    the unbounded stream. Works identically in batch mode (watermarks
    no-op), so the batch form is oracle-checkable.

    ``how="leftOuter"`` keeps purchases with no follow-up error: the
    null-padded row is emitted only once the watermark passes the end of
    that purchase's match interval (state-expiry is what proves no match
    can still arrive) — so outer results trail the data by up to
    watermark + lag.
    """
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col("user_id"),
        F.col(ts_col).alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    e = errors.withWatermark(ts_col, watermark).select(
        F.col("user_id").alias("_e_user"),
        F.col(ts_col).alias("e_ts"),
        F.col("event_id").alias("error_id"),
    )
    cond = (
        (p.user_id == e._e_user)
        & (e.e_ts >= p.p_ts)
        & (e.e_ts <= p.p_ts + F.expr(f"INTERVAL {max_lag_minutes} MINUTES"))
    )
    return p.join(e, cond, how).select(
        "user_id", "purchase_id", "p_ts", "error_id", "e_ts", "purchase_value"
    )


def sessionized_user_activity(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows (inactivity gap) under a watermark —
    Spark's native stateful session operator; state per open session only."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.max(ts_col).alias("last_event"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "last_event",
        )
    )

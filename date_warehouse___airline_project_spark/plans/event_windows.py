"""Event-time window queries over ``events`` — tumbling, sliding, and
session windows (SURVEY §2.12 notes these as reference gaps we fill; the
same expressions run in Structured Streaming via streaming/windows.py).

Window-origin note: Spark's ``window()`` aligns to the epoch; DuckDB's
``time_bucket`` aligns to 2000-01-01, which lies on every 5/10/15-minute
grid line of the epoch, so bucket starts agree for the widths used here.

Session semantics: Spark's ``session_window(ts, gap)`` closes a session
when the next event is ≥ gap after the previous one (window is
``[start, last+gap)``); the oracle's gaps-and-islands flag uses the same
strict comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT STRFTIME(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Tumbling 15-minute event-time window aggregation (streaming-ready: "
    "identical groupBy(window(...)) runs under a watermark in streaming/).",
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "sliding_window_counts",
    oracle="""
    WITH starts AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, user_id FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', user_id FROM events)
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM starts
    GROUP BY ws
    ORDER BY window_start
    """,
    doc="Sliding window (10-minute length, 5-minute hop): every event lands "
    "in exactly two windows; the oracle enumerates both bucket starts.",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "n_users",
        )
        .orderBy("window_start")
    )


@query(
    "session_window_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_event,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    doc="Session windows with a 30-minute inactivity gap per user "
    "(session_window in Spark; gaps-and-islands in the oracle).",
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("_last"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("_last", "yyyy-MM-dd HH:mm:ss").alias("last_event"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )

"""Map-type, timezone, nested-JSON, and sessionization surface.

The reference's only semi-structured data is flat JSON blobs (SURVEY
§2.11) and its only timezone handling is a static 8-entry airport map
(F-D9, functions.py:111-125). A Spark-native engine carries first-class
MapType columns, real IANA timezone conversion, and nested
struct<->JSON round-trips; this module pins each against the oracle.

Timezone parity note: DuckDB's two-argument ``timezone(tz, ts)`` on a
*naive* timestamp has AT TIME ZONE semantics (interpret the naive value
as tz-local, return the instant) — the OPPOSITE direction of Spark's
``from_utc_timestamp``. The oracle therefore double-converts:
``timezone(tz, timezone('UTC', ts))`` first pins the naive value as a
UTC instant, then renders it in the target zone — session-timezone
independent on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "map_functions_battery",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_n,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low_n,
           COUNT(*) AS total_from_map,
           MAX(o_orderpriority) AS max_priority_key,
           COUNT(*) * 2 AS doubled_total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="MapType surface: per-status priority->count maps built with "
    "map_from_entries(sort_array(collect_list(struct))), then read back "
    "through element_at, map_keys/map_values, transform_values, and a "
    "lambda fold over map_values — the oracle recomputes every scalar "
    "with plain conditional aggregation, proving the map path loses "
    "nothing.",
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_prio = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("o_orderpriority", "cnt")))
    ).alias("m")
    mapped = per_prio.groupBy("o_orderstatus").agg(m)
    doubled = F.transform_values(F.col("m"), lambda _, v: v * 2)
    zero = F.lit(0).cast("long")
    return mapped.select(
        "o_orderstatus",
        F.size("m").cast("long").alias("n_priorities"),
        F.coalesce(F.element_at("m", "1-URGENT"), zero).alias("urgent_n"),
        F.coalesce(F.element_at("m", "5-LOW"), zero).alias("low_n"),
        F.aggregate(F.map_values("m"), zero, lambda acc, x: acc + x).alias("total_from_map"),
        F.array_max(F.map_keys("m")).alias("max_priority_key"),
        F.aggregate(F.map_values(doubled), zero, lambda acc, x: acc + x).alias("doubled_total"),
    ).orderBy("o_orderstatus")


@query(
    "timezone_conversion_battery",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(timezone('America/New_York', timezone('UTC', o_orderdate)),
                    '%Y-%m-%d %H:%M:%S') AS ny_local,
           STRFTIME(timezone('Asia/Tokyo', timezone('UTC', o_orderdate)),
                    '%Y-%m-%d %H:%M:%S') AS tokyo_local,
           CAST(EXTRACT(HOUR FROM timezone('Asia/Tokyo', timezone('UTC', o_orderdate)))
                AS BIGINT) AS tokyo_hour,
           CAST(timezone('America/New_York', timezone('UTC', o_orderdate)) AS DATE)
               <> CAST(o_orderdate AS DATE) AS crossed_date_line
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    doc="IANA timezone conversion (UTC -> America/New_York with DST, "
    "UTC -> Asia/Tokyo fixed offset): from_utc_timestamp vs the oracle's "
    "double-timezone() form (see module docstring), plus local-hour "
    "extraction and a date-rollover flag. Generalizes the reference's "
    "static airport-timezone map (functions.py:111-125).",
)
def timezone_conversion_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ny = F.from_utc_timestamp("o_orderdate", "America/New_York")
    tokyo = F.from_utc_timestamp("o_orderdate", "Asia/Tokyo")
    return (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_local"),
            F.date_format(tokyo, "yyyy-MM-dd HH:mm:ss").alias("tokyo_local"),
            F.hour(tokyo).cast("long").alias("tokyo_hour"),
            (F.to_date(ny) != F.to_date("o_orderdate")).alias("crossed_date_line"),
        )
        .orderBy("o_orderkey")
    )


_EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("user", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("metrics", T.StructType([T.StructField("v", T.DoubleType())])),
        T.StructField("tags", T.ArrayType(T.LongType())),
    ]
)


@query(
    "json_nested_roundtrip",
    oracle="""
    SELECT event_id,
           '{"user":' || user_id || ',"kind":"' || event_type ||
               '","metrics":{"v":' || CAST(value AS VARCHAR) ||
               '},"tags":[' || (event_id % 10) || ',' || (user_id % 10) || ']}'
               AS json_doc,
           user_id AS rt_user,
           event_type AS rt_kind,
           value AS rt_v,
           (event_id % 10) + (user_id % 10) AS rt_tag_sum
    FROM events
    WHERE event_id % 53 = 0
    ORDER BY event_id
    """,
    doc="Nested struct+array -> to_json -> from_json round-trip: builds a "
    "4-field document (scalar, string, nested struct, array), serializes, "
    "re-parses with an explicit schema, and extracts every field back. "
    "The oracle string-builds the identical compact JSON byte-for-byte "
    "(Spark's to_json emits no whitespace) and recomputes the extracted "
    "values relationally. Upgrades the reference's JSON.parse-with-raw-"
    "fallback (kafkaworker.js:47-52) to typed schema-on-read.",
)
def json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 53 == 0)
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("user"),
            F.col("event_type").alias("kind"),
            F.struct(F.col("value").alias("v")).alias("metrics"),
            F.array(F.col("event_id") % 10, F.col("user_id") % 10).alias("tags"),
        )
    )
    parsed = F.from_json(doc, _EVENT_JSON_SCHEMA)
    return ev.select(
        "event_id",
        doc.alias("json_doc"),
        parsed["user"].alias("rt_user"),
        parsed["kind"].alias("rt_kind"),
        parsed["metrics"]["v"].alias("rt_v"),
        F.aggregate(parsed["tags"], F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "rt_tag_sum"
        ),
    ).orderBy("event_id")


_SESSIONIZE_SQL = """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(event_id) AS first_event, MAX(event_id) AS last_event
    FROM sessions
    GROUP BY user_id, session_id
    HAVING COUNT(*) >= 3
    ORDER BY user_id, session_id
"""


@query(
    "lag_gap_sessionization",
    oracle=_SESSIONIZE_SQL,
    doc="Classic batch sessionization as IDENTICAL portable SQL on both "
    "engines: LAG gap > 30 min marks a session start, a running SUM "
    "numbers the sessions, then per-session stats. The window-function "
    "formulation of what session_window_stats does with Spark's native "
    "session_window - same 30-minute gap semantics, fully ANSI.",
)
def lag_gap_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_SESSIONIZE_SQL)


@query(
    "map_functions_battery2",
    oracle="""
    WITH per AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p,
               COUNT(*) AS c,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ), tot AS (
        SELECT s, SUM(c) AS tc, COUNT(*) AS np FROM per GROUP BY 1
    )
    SELECT t.s AS o_orderstatus,
           t.np AS n_priorities,
           (SELECT COUNT(*) FROM per x WHERE x.s = t.s AND x.c * 10 > t.tc)
               AS n_major,
           (SELECT CAST((x.cents - x.cents % x.c) / x.c AS BIGINT)
            FROM per x WHERE x.s = t.s AND x.p = '1-URGENT') AS avg_cents_urgent,
           (SELECT x.c FROM per x WHERE x.s = t.s AND x.p LIKE '1%') AS cnt_p1,
           t.np + 1 AS n_with_total,
           (SELECT STRING_AGG(x.p, ',' ORDER BY x.p) FROM per x WHERE x.s = t.s)
               AS keys_csv
    FROM tot t
    ORDER BY o_orderstatus
    """,
    doc="Map battery 2: map_filter (majority-share priorities, integer "
    "cross-multiply so no FP division), map_zip_with (per-priority mean "
    "cents via the exact s - s%c quotient trick), transform_keys "
    "(priority digit), map_concat with a literal singleton map, and a "
    "map_entries<->map_from_entries round-trip surfaced as a sorted "
    "key CSV. Money is exact decimal cents (bigint) so every value is "
    "order-independent; the oracle recomputes each scalar relationally.",
)
def map_functions_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("c"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents"),
    )
    mapped = per.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "c")))
        ).alias("m_cnt"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "cents")))
        ).alias("m_cents"),
    )
    zero = F.lit(0).cast("long")
    total = F.aggregate(F.map_values("m_cnt"), zero, lambda a, x: a + x)
    # exact integer mean: (s - s % c) / c is an exact double op below 2^53
    m_avg = F.map_zip_with(
        "m_cnt", "m_cents", lambda _, c, s: ((s - s % c) / c).cast("long")
    )
    roundtrip = F.map_from_entries(F.map_entries("m_cnt"))
    return (
        mapped.withColumn("tc", total)
        .select(
            "o_orderstatus",
            F.size("m_cnt").cast("long").alias("n_priorities"),
            F.size(
                F.map_filter("m_cnt", lambda _, v: v * 10 > F.col("tc"))
            ).cast("long").alias("n_major"),
            F.element_at(m_avg, "1-URGENT").alias("avg_cents_urgent"),
            F.element_at(
                F.transform_keys("m_cnt", lambda k, _: F.substring(k, 1, 1)), "1"
            ).alias("cnt_p1"),
            F.size(
                F.map_concat("m_cnt", F.create_map(F.lit("__total__"), F.col("tc")))
            ).cast("long").alias("n_with_total"),
            F.array_join(F.sort_array(F.map_keys(roundtrip)), ",").alias("keys_csv"),
        )
        .orderBy("o_orderstatus")
    )

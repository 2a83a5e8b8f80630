"""Temporal joins and ordered-collection surface: as-of join (backward),
interval/range join, explode/unnest, and ordered string aggregation.

None of these exist in the reference (SURVEY §2.3 notes "No theta, range,
as-of, or interval joins"), but they are table stakes for a time-series /
training-data warehouse, and DuckDB can oracle every one (ASOF JOIN is
native DuckDB syntax).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..sources.catalog import load_table
from .registry import query

DEC = "decimal(18,2)"

# Month-end observation points inside the data's shipdate range (1995–2001).
MONTH_ENDS = [
    "1996-03-31 00:00:00",
    "1996-12-31 00:00:00",
    "1997-06-30 00:00:00",
    "1998-01-31 00:00:00",
    "1999-03-31 00:00:00",
    "2000-06-30 00:00:00",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "asof_purchase_before_error",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'error') WHERE rn = 1),
    e AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, e.user_id,
           STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.event_id AS prior_error_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS prior_error_ts,
           p.value AS prior_error_value
    FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
    doc="Backward as-of join (operators/asof.py): each purchase matched to "
    "the user's most recent error at-or-before it. Union-tag + keyed "
    "window — one shuffle on user_id, sort-merge asymptotics; oracle is "
    "DuckDB's native ASOF LEFT JOIN. Right side deduped per (user, ts) "
    "for a deterministic tie winner on both engines.",
)
def asof_purchase_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    wdd = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("_rn", F.row_number().over(wdd))
        .filter(F.col("_rn") == 1)
        .select("event_id", "ts", "user_id", "value")
    )
    joined = asof_join_backward(
        left=purchases,
        right=errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["event_id", "ts", "value"],
        right_tiebreak=["event_id"],
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("event_id_matched").alias("prior_error_id"),
            F.date_format("ts_matched", "yyyy-MM-dd HH:mm:ss").alias("prior_error_ts"),
            F.col("value_matched").alias("prior_error_value"),
        )
        .orderBy("event_id")
    )


@query(
    "range_join_inflight_shipments",
    oracle=f"""
    SELECT STRFTIME(m.month_end, '%Y-%m-%d') AS month_end,
           COUNT(*) AS in_flight,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_in_flight
    FROM (VALUES {", ".join(f"(TIMESTAMP '{d}')" for d in MONTH_ENDS)}) m(month_end)
    JOIN lineitem l
      ON m.month_end >= l.l_shipdate
     AND m.month_end < l.l_shipdate + INTERVAL 30 DAY
    GROUP BY m.month_end
    ORDER BY month_end
    """,
    doc="Interval/range join: observation timestamps against [shipdate, "
    "shipdate+30d) delivery windows. The tiny side broadcasts, so the "
    "inequality join is a broadcast nested-loop over the fact — the "
    "correct physical plan at any fact scale (never a cross shuffle).",
)
def range_join_inflight_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate",
        "l_quantity",
        # Precompute the window end: the BNL join condition is evaluated
        # per (row × month_end) on the non-codegen path, so it must be
        # plain column comparisons — interval arithmetic inside the
        # condition costs ~10× per evaluation.
        (F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS")).alias("_ship_end"),
    )
    m = spark.createDataFrame([(d,) for d in MONTH_ENDS], ["month_end_s"]).select(
        F.col("month_end_s").cast("timestamp").alias("month_end")
    )
    cond = (F.col("month_end") >= F.col("l_shipdate")) & (
        F.col("month_end") < F.col("_ship_end")
    )
    return (
        li.join(F.broadcast(m), cond)
        .groupBy("month_end")
        .agg(
            F.count("*").alias("in_flight"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty_in_flight"),
        )
        .select(
            F.date_format("month_end", "yyyy-MM-dd").alias("month_end"),
            "in_flight",
            "qty_in_flight",
        )
        .orderBy("month_end")
    )


@query(
    "followup_error_after_purchase",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           e.event_id AS error_id,
           STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 DAY
    ORDER BY purchase_id, error_id
    """,
    doc="Event-interval follow-up join (batch form of streaming/windows.py::"
    "stream_stream_followup_join — same logical plan runs as a watermarked "
    "stream-stream join): errors within 1 day after a same-user purchase. "
    "Equi-join on user_id with the range as a join filter — sort-merge "
    "shape, never a cross product.",
)
def followup_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import stream_stream_followup_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    errors = ev.filter(F.col("event_type") == "error")
    joined = stream_stream_followup_join(purchases, errors, max_lag_minutes=1440)
    return (
        joined.select(
            "user_id",
            "purchase_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "error_id",
            F.date_format("e_ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
            "purchase_value",
        )
        .orderBy("purchase_id", "error_id")
    )


@query(
    "doc_top_words",
    oracle="""
    SELECT w AS word, COUNT(*) AS cnt
    FROM (SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w
    ORDER BY cnt DESC, word
    LIMIT 25
    """,
    doc="Explode/unnest surface: tokenize → flatten → count. Partial "
    "aggregation absorbs the token blow-up before the shuffle.",
)
def doc_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(25)
    )


@query(
    "user_event_sequences",
    oracle="""
    SELECT user_id,
           STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS seq,
           COUNT(*) AS n_events
    FROM (SELECT user_id, ts, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn <= 10
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Ordered string aggregation: each user's first-10 event-type "
    "sequence. collect_list is order-nondeterministic under shuffle, so "
    "the order key travels inside the collected structs and the sort "
    "happens per-group after collection — deterministic at any "
    "parallelism.",
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first10 = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    return (
        first10.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("seq"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "last_touch_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_type FROM (
        SELECT user_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('click', 'view', 'signup')) WHERE rn = 1),
    p AS (SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase'),
    a AS (
      SELECT p.event_id, p.value,
             COALESCE(t.event_type, 'direct') AS channel
      FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts >= t.ts),
    g AS (
      SELECT channel, COUNT(*) AS n_purchases,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS rev
      FROM a GROUP BY channel),
    tot AS (SELECT SUM(rev) AS total_rev FROM g)
    SELECT channel, n_purchases,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(100.0 * rev / tot.total_rev, 2) AS revenue_pct
    FROM g, tot
    ORDER BY channel
    """,
    doc="Last-touch marketing attribution: every purchase's value is "
    "credited to the user's most recent preceding touch event (click/"
    "view/signup; 'direct' when none) via the SAME backward as-of join "
    "operator as asof_purchase_before_error (operators/asof.py — one "
    "user_id shuffle, sort-merge asymptotics, deterministic per-(user,"
    "ts) tie winner), then a channel-bounded revenue rollup with "
    "DECIMAL-summed shares. The canonical events-to-revenue accounting "
    "query of a behavioral warehouse.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    wdd = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    touches = (
        ev.filter(F.col("event_type").isin("click", "view", "signup"))
        .withColumn("_rn", F.row_number().over(wdd))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "event_type")
    )
    joined = asof_join_backward(
        left=purchases,
        right=touches,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["event_type"],
    )
    g = (
        joined.select(
            F.coalesce(F.col("event_type_matched"), F.lit("direct")).alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).alias("rev"),
        )
    )
    tot = g.agg(F.sum("rev").alias("total_rev"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_purchases",
            F.col("rev").cast("double").alias("revenue"),
            F.round(100.0 * F.col("rev") / F.col("total_rev"), 2).alias("revenue_pct"),
        )
        .orderBy("channel")
    )

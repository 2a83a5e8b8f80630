"""Time-series warehouse operations over ``orders`` and ``events``:
calendar densification with forward-fill (the scale-out generalization of
the reference's ffill id-repair, SURVEY W1 / cleaning.py:554-570), cohort
retention, and event-funnel staging.

Gap-fill strategy: per-key ``sequence(min_day, max_day)`` + explode builds
the dense calendar WITHOUT a driver-side loop or a global sort — each
user's series is generated and filled inside its own hash partition, so
the plan scales linearly with keys (the ffill window partitions by user;
no single-task global window anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "timeseries_gapfill_ffill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               ARG_MAX(value, event_id) AS day_value
        FROM events WHERE user_id % 10 = 3
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    calendar AS (
        SELECT s.user_id, CAST(UNNEST(GENERATE_SERIES(s.d0, s.d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM spans s
    )
    SELECT c.user_id,
           STRFTIME(c.day, '%Y-%m-%d') AS day,
           d.day_value IS NOT NULL AS observed,
           LAST_VALUE(d.day_value IGNORE NULLS) OVER (
               PARTITION BY c.user_id ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM calendar c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
    ORDER BY c.user_id, c.day
    """,
    doc="Per-user daily densification (sequence+explode — no global sort) "
    "left-joined to observed per-day values (arg_max by event_id for a "
    "deterministic intra-day winner), then forward-filled with "
    "last(ignorenulls) over a per-user window. The distributed form of "
    "the reference's order-dependent ffill (cleaning.py:554-570).",
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max_by("value", "event_id").alias("day_value")
    )
    spans = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    joined = calendar.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    ).orderBy("user_id", "day")


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey, MIN(DATE_TRUNC('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    activity AS (
        SELECT DISTINCT o.o_custkey, f.cohort,
               DATE_TRUNC('month', o.o_orderdate) AS act_month
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT STRFTIME(cohort, '%Y-%m') AS cohort_month,
           DATEDIFF('month', cohort, act_month) AS months_since,
           COUNT(*) AS n_active
    FROM activity
    GROUP BY cohort, DATEDIFF('month', cohort, act_month)
    HAVING COUNT(*) >= 3
    ORDER BY cohort_month, months_since
    """,
    doc="Cohort retention: first-order month per customer (the cohort), "
    "distinct active months joined back, counted by (cohort, "
    "months-since). Pure count/date arithmetic — exact parity.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("cohort"))
    activity = (
        o.join(firsts, "o_custkey")
        .select("o_custkey", "cohort", month.alias("act_month"))
        .distinct()
    )
    months_since = (
        (F.year("act_month") - F.year("cohort")) * 12 + F.month("act_month") - F.month("cohort")
    ).cast("long")
    return (
        activity.groupBy(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            months_since.alias("months_since"),
        )
        .agg(F.count("*").alias("n_active"))
        .filter(F.col("n_active") >= 3)
        .orderBy("cohort_month", "months_since")
    )


@query(
    "funnel_stage_counts",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after,
           (SELECT COUNT(*) FROM p) AS n_purchased_after
    """,
    doc="Ordered event funnel view -> click-after-view -> purchase-after-"
    "click: staged min-timestamp joins (each stage anchored strictly "
    "after the previous stage's first event), counted per stage.",
)
def funnel_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after")))
    )


_FUNNEL_1H_ORACLE = """
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    conv AS (
      SELECT c.event_id
      FROM c
      WHERE EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts >= c.ts
          AND p.ts <= c.ts + INTERVAL 1 HOUR))
    SELECT STRFTIME(CAST(c.ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(COUNT(v.event_id) AS BIGINT) AS n_converted,
           ROUND(CAST(COUNT(v.event_id) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
    FROM c LEFT JOIN conv v ON v.event_id = c.event_id
    GROUP BY CAST(c.ts AS DATE)
    ORDER BY day
"""


@query(
    "funnel_conversion_1h",
    oracle=_FUNNEL_1H_ORACLE,
    doc="Time-windowed funnel conversion: per day, the share of clicks "
    "followed by a purchase from the SAME user within one hour. The "
    "window predicate rides a user-keyed equi-join (hash join + range "
    "post-filter, fan-out bounded by per-user event rates), then a "
    "left-semi EXISTS marks converted clicks — never a time-cross "
    "product. One shuffle on user, one on day.",
)
def funnel_conversion_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("ts"))
        & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select("event_id")
    tagged = clicks.join(
        converted.withColumn("_conv", F.lit(1)), "event_id", "left"
    )
    return (
        tagged.groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_clicks"),
            F.sum(F.coalesce("_conv", F.lit(0))).cast("bigint").alias("n_converted"),
            F.round(
                F.sum(F.coalesce("_conv", F.lit(0))).cast("double") / F.count("*"), 6
            ).alias("conversion_rate"),
        )
        .orderBy("day")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    t AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM s WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type),
    r AS (SELECT prev_type, SUM(n) AS row_n FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, t.n,
           ROUND(CAST(t.n AS DOUBLE) / r.row_n, 6) AS p_transition
    FROM t JOIN r ON r.prev_type = t.prev_type
    ORDER BY t.prev_type, t.next_type
    """,
    doc="First-order Markov transition matrix over user event streams: "
    "per-user LAG pairs (one user_id-partitioned window — the shuffle "
    "every sessionization already pays), then a type x type-bounded "
    "count matrix with row-normalized transition probabilities (exact "
    "integer ratios). The behavioral-model summary (next-action "
    "prediction, funnel leak detection) that reads a corpus once and "
    "returns |event_types|^2 rows regardless of volume.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    r = t.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        t.join(r, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias(
                "p_transition"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "seasonality_decomposition_revenue",
    oracle="""
    WITH m AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS mon,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1),
    o AS (SELECT mon, rev, ROW_NUMBER() OVER (ORDER BY mon) AS i FROM m),
    tr AS (
      SELECT a.mon, a.rev,
             (0.5 * MAX(CASE WHEN b.i = a.i - 6 THEN b.rev END)
              + SUM(CASE WHEN b.i BETWEEN a.i - 5 AND a.i + 5 THEN b.rev END)
              + 0.5 * MAX(CASE WHEN b.i = a.i + 6 THEN b.rev END)) / 12.0
               AS trend
      FROM o a JOIN o b ON b.i BETWEEN a.i - 6 AND a.i + 6
      GROUP BY a.mon, a.rev, a.i
      HAVING COUNT(*) = 13),
    r AS (
      SELECT CAST(MONTH(mon) AS INTEGER) AS month_num,
             ROUND(rev / trend, 8) AS ratio
      FROM tr)
    SELECT month_num, COUNT(*) AS n_obs,
           ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,8))) AS DOUBLE)
                 / COUNT(*), 6) AS seasonal_index
    FROM r
    GROUP BY month_num
    ORDER BY month_num
    """,
    doc="Classical multiplicative seasonal decomposition of monthly "
    "revenue: centered 2x12 moving-average trend (the textbook "
    "even-window form: half-weight end months), per-month actual/trend "
    "ratios, seasonal index = mean ratio per calendar month. Corpus-"
    "scale work is ONE monthly aggregate; the MA and index run on the "
    "<=84-row month relation (self-join window form so both engines "
    "share exact arithmetic; DECIMAL-summed means).",
)
def seasonality_decomposition_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev")
    )
    # rank window over the <=84-row month relation (allowlisted)
    om = m.withColumn("i", F.row_number().over(Window.orderBy("mon")))
    a = om.select(F.col("mon"), F.col("rev"), F.col("i"))
    b = om.select(F.col("i").alias("j"), F.col("rev").alias("rev_b"))
    tr = (
        a.join(F.broadcast(b), (F.col("j") >= F.col("i") - 6) & (F.col("j") <= F.col("i") + 6))
        .groupBy("mon", "rev", "i")
        .agg(
            (
                (
                    0.5 * F.max(F.when(F.col("j") == F.col("i") - 6, F.col("rev_b")))
                    + F.sum(
                        F.when(
                            F.col("j").between(F.col("i") - 5, F.col("i") + 5),
                            F.col("rev_b"),
                        )
                    )
                    + 0.5 * F.max(F.when(F.col("j") == F.col("i") + 6, F.col("rev_b")))
                )
                / 12.0
            ).alias("trend"),
            F.count(F.lit(1)).alias("w"),
        )
        .filter(F.col("w") == 13)
    )
    r = tr.select(
        F.month("mon").cast("int").alias("month_num"),
        F.round(F.col("rev") / F.col("trend"), 8).alias("ratio"),
    )
    return (
        r.groupBy("month_num")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("month_num")
    )

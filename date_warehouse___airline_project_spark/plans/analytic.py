"""Analytic / OLAP surface beyond the reference's four window shapes
(SURVEY §2.5 notes the reference has only ffill, keep-first, top-1 and
recent-N): lead/lag, ranking families, exact percentiles, CUBE with
grouping flags, pivot, and statistical aggregates.

All window partitions are keyed (never a global ORDER BY over the fact),
so every shape here shuffles once on its partition key and scales
linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query

DEC = "decimal(18,2)"

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "lead_lag_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev,
           DATE_DIFF('day', o_orderdate, LEAD(o_orderdate) OVER w) AS days_until_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="LAG/LEAD over a keyed window: per-customer gaps between "
    "consecutive orders (nulls at partition edges preserved).",
)
def lead_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
            .cast("bigint")
            .alias("days_since_prev"),
            F.datediff(F.lead("o_orderdate").over(w), "o_orderdate")
            .cast("bigint")
            .alias("days_until_next"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "ntile_rank_acctbal",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS bal_quartile,
           RANK() OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS bal_pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    doc="Ranking family (NTILE/RANK/DENSE_RANK/PERCENT_RANK) per market "
    "segment — partitioned windows, never a global sort.",
)
def ntile_rank_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("bal_quartile"),
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
            F.round(F.percent_rank().over(w), 6).cast("double").alias("bal_pct_rank"),
        )
        .orderBy("c_custkey")
    )


@query(
    "percentile_totalprice_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.25), 4) AS DOUBLE) AS p25,
           CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.50), 4) AS DOUBLE) AS p50,
           CAST(ROUND(QUANTILE_CONT(o_totalprice, 0.75), 4) AS DOUBLE) AS p75,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact linear-interpolated percentiles per group (Spark "
    "`percentile` ≡ DuckDB `quantile_cont`). The exact variant is the "
    "oracle anchor; at 100 TB the same query swaps to approx_percentile.",
)
def percentile_totalprice_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return (
        o.groupBy("o_orderpriority")
        .agg(pct.alias("_p"), F.count("*").alias("n_orders"))
        .select(
            "o_orderpriority",
            F.round(F.element_at("_p", 1), 4).cast("double").alias("p25"),
            F.round(F.element_at("_p", 2), 4).cast("double").alias("p50"),
            F.round(F.element_at("_p", 3), 4).cast("double").alias("p75"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "cube_returnflag_linestatus",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus, g_flag, g_status
    """,
    doc="CUBE over (returnflag, linestatus) with GROUPING() flags — the "
    "full grouping-sets surface (ROLLUP is covered separately).",
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import rebalance_compute

    # cube Expand multiplies every row 4x BEFORE the aggregate partials,
    # all inside the scan stage; single-file scans plan one task
    # (measured 2.4 s -> 1.4 s at sf0.1/32 cores; no-op when the scan
    # parallelizes on its own)
    li = rebalance_compute(
        _t(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_extendedprice"
        )
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("total_price"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "total_price",
            "n_items",
        )
        .orderBy("returnflag", "linestatus", "g_flag", "g_status")
    )


@query(
    "pivot_nation_segment_counts",
    oracle="""
    SELECT n.n_name AS nation_name,
           COUNT(CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS automobile,
           COUNT(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 END) AS building,
           COUNT(CASE WHEN c.c_mktsegment = 'FURNITURE' THEN 1 END) AS furniture,
           COUNT(CASE WHEN c.c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS household,
           COUNT(CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 END) AS machinery
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation_name
    """,
    doc="Pivot (long→wide) with an explicit value list — one pass, no "
    "second scan; missing cells filled with 0 to match COUNT(CASE).",
)
def pivot_nation_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    wide = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .pivot("c_mktsegment", SEGMENTS)
        .count()
        .na.fill(0, [s for s in SEGMENTS])
    )
    return wide.select(
        "nation_name", *[F.col(s).alias(s.lower()) for s in SEGMENTS]
    ).orderBy("nation_name")


@query(
    "stats_quantity_battery",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)), 6) AS DOUBLE) AS qty_stddev,
           CAST(ROUND(VAR_SAMP(CAST(l_quantity AS DOUBLE)), 6) AS DOUBLE) AS qty_var,
           CAST(ROUND(CORR(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 6) AS DOUBLE)
               AS qty_disc_corr,
           CAST(ROUND(COVAR_SAMP(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 6)
               AS DOUBLE) AS qty_disc_covar,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Statistical aggregate family (stddev/var/corr/covar) — single "
    "pass, partial-aggregable, rounded to absorb float merge-order noise.",
)
def stats_quantity_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    d = F.col("l_discount").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp(q), 6).cast("double").alias("qty_stddev"),
            F.round(F.var_samp(q), 6).cast("double").alias("qty_var"),
            F.round(F.corr(q, d), 6).cast("double").alias("qty_disc_corr"),
            F.round(F.covar_samp(q, d), 6).cast("double").alias("qty_disc_covar"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form rollup/cube specialize. One shuffle;
# Spark expands the sets map-side (Expand operator) so partial aggregation
# still absorbs the fan-out before the exchange.
# ---------------------------------------------------------------------------
@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(c.c_mktsegment, 'ALL') AS seg,
           COALESCE(o.o_orderpriority, 'ALL') AS prio,
           CAST(GROUPING(c.c_mktsegment) AS INT) AS g_seg,
           CAST(GROUPING(o.o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY GROUPING SETS ((c.c_mktsegment, o.o_orderpriority),
                            (c.c_mktsegment), ())
    ORDER BY g_seg, g_prio, seg, prio
    """,
    doc="GROUPING SETS (the general form of rollup/cube) with GROUPING() "
    "disambiguation flags — Spark's Expand operator fans the sets out "
    "map-side, so partial agg still precedes the single shuffle.",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        j.groupingSets(
            [[F.col("c_mktsegment"), F.col("o_orderpriority")], [F.col("c_mktsegment")], []],
            F.col("c_mktsegment"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("seg"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("prio"),
            "g_seg",
            "g_prio",
            "n_orders",
            "revenue",
        )
        .orderBy("g_seg", "g_prio", "seg", "prio")
    )


# ---------------------------------------------------------------------------
# Interval RANGE frame — trailing 30-day spend per customer. Spark range
# frames need a numeric order key, so the date becomes a day number
# (unix_date); DuckDB's native INTERVAL frame over the timestamp defines
# the identical row set (all timestamps are midnight-aligned).
# ---------------------------------------------------------------------------
@query(
    "trailing_30d_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    ORDER BY o_orderkey
    LIMIT 500
    """,
    doc="Time-interval RANGE window frame: trailing 30-day spend per "
    "customer (rangeBetween over a day-number order key ≡ DuckDB's "
    "INTERVAL frame). Exact decimal sum inside the frame, double at the "
    "edge.",
)
def trailing_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-30, 0)
    )
    return (
        o.withColumn(
            "trailing_30d_spend",
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "trailing_30d_spend",
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "percentile_disc_cume_dist",
    oracle="""
    WITH w AS (
        SELECT o_orderpriority, o_totalprice,
               CUME_DIST() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice) AS cd
        FROM orders
    )
    SELECT o_orderpriority,
           MIN(CASE WHEN cd >= 0.25 THEN o_totalprice END) AS p25_disc,
           MIN(CASE WHEN cd >= 0.5 THEN o_totalprice END) AS median_disc,
           MIN(CASE WHEN cd >= 0.9 THEN o_totalprice END) AS p90_disc,
           COUNT(*) FILTER (WHERE cd <= 0.25) AS n_bottom_quartile
    FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Discrete percentiles (percentile_disc WITHIN GROUP - values "
    "drawn from the data, no interpolation) plus a cume_dist()-derived "
    "bottom-quartile count. The oracle pins the ANSI definition "
    "explicitly: percentile_disc(p) = MIN(x) where cume_dist >= p.",
)
def percentile_disc_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    cd = o.select("o_orderpriority", "o_totalprice", F.cume_dist().over(w).alias("cd"))
    disc = o.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").alias("p25_disc"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("median_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias("p90_disc"),
    )
    bottom = cd.filter(F.col("cd") <= 0.25).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_bottom_quartile")
    )
    return disc.join(bottom, "o_orderpriority").orderBy("o_orderpriority")


@query(
    "trailing_distinct_users",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    grid AS (SELECT DISTINCT day FROM pairs)
    SELECT g.day AS day, COUNT(DISTINCT p.user_id) AS n_users_7d
    FROM grid g JOIN pairs p ON p.day BETWEEN g.day - 6 AND g.day
    GROUP BY g.day
    ORDER BY day
    """,
    doc="Trailing-7-day distinct users per day - the windowed COUNT "
    "DISTINCT Spark windows cannot express directly. Formulated as "
    "day-grid x (day,user) pairs range join + exact countDistinct: "
    "scales by shuffling pairs, never a single-partition window; the "
    "oracle uses the same join shape. Day emitted as yyyy-MM-dd string.",
)
def trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pairs = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    grid = pairs.select("day").distinct().select(F.col("day").alias("g_day"))
    joined = pairs.join(
        F.broadcast(grid),
        (F.col("day") >= F.date_sub(F.col("g_day"), 6)) & (F.col("day") <= F.col("g_day")),
    )
    return (
        joined.groupBy("g_day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
        .select(F.date_format("g_day", "yyyy-MM-dd").alias("day"), "n_users_7d")
        .orderBy("day")
    )


@query(
    "linear_regression_exact",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(o_custkey) AS DOUBLE) AS sx,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(o_custkey * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
               CAST(SUM(o_custkey * o_custkey) AS DOUBLE) AS sxx
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
    FROM s ORDER BY o_orderpriority
    """,
    doc="Least-squares slope/intercept per group (the regr_slope/"
    "regr_intercept surface) computed from EXACT decimal/integer sums "
    "cast to double before the closed-form arithmetic - identical "
    "doubles in, identical doubles out, no float-summation order "
    "nondeterminism (built-in regr_* accumulates in double and is not "
    "cross-engine reproducible).",
)
def linear_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("decimal(18,2)")
    x = F.col("o_custkey")
    s = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "o_orderpriority",
        n.cast("bigint").alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) via sorted running-min — no pairwise scan
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
    WITH pts AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             o_orderdate
      FROM orders),
    ranked AS (
      SELECT o_orderkey, price, o_orderdate,
             MIN(price) OVER (ORDER BY o_orderdate DESC, price ASC, o_orderkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS best_prior
      FROM pts)
    SELECT o_orderkey, CAST(price AS DOUBLE) AS price,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date
    FROM ranked
    WHERE best_prior IS NULL OR price < best_prior
    ORDER BY o_orderdate DESC, price, o_orderkey
"""


@query(
    "pareto_frontier_orders",
    oracle=_SKYLINE_ORACLE,
    doc="Skyline / Pareto frontier (prefer NEWER order date AND LOWER "
    "price): the classic formulation is a quadratic 'no dominating row "
    "exists' anti-join; in 2-D it collapses to a sort + running-min "
    "window — a point is on the frontier iff its price beats the minimum "
    "price of everything newer. Scale shape is TWO phases: a local prune "
    "with the identical rule inside hash buckets (window PARTITIONED by "
    "bucket — locally dominated rows cannot be on the global frontier, "
    "and a random bucket's frontier is ~log-size), then the global "
    "running-min only over the pruned superset (allowlisted global "
    "window over a frontier-scale relation). Dominance is evaluated in "
    "DECIMAL (exact), deterministic tie-breaks in the frame order.",
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash56

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_orderdate",
    )
    order = [F.desc("o_orderdate"), F.asc("price"), F.asc("o_orderkey")]
    frame = (W.unboundedPreceding, -1)
    # phase 1: per-bucket prune (distributed windows; any partitioning is
    # sound because local domination implies global domination)
    lw = (
        W.partitionBy(hash56(F.col("o_orderkey")) % 32)
        .orderBy(*order)
        .rowsBetween(*frame)
    )
    pruned = o.withColumn("best_prior", F.min("price").over(lw)).filter(
        F.col("best_prior").isNull() | (F.col("price") < F.col("best_prior"))
    ).drop("best_prior")
    # phase 2: exact frontier over the ~log-size superset
    w = W.orderBy(*order).rowsBetween(*frame)
    ranked = pruned.withColumn("best_prior", F.min("price").over(w))
    return (
        ranked.filter(F.col("best_prior").isNull() | (F.col("price") < F.col("best_prior")))
        .select(
            "o_orderkey",
            F.col("price").cast("double").alias("price"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.desc("order_date"), "price", "o_orderkey")
    )


@query(
    "winsorized_price_stats",
    oracle="""
    WITH w AS (
      SELECT o_orderpriority, o_totalprice,
             CUME_DIST() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice) AS cd
      FROM orders),
    b AS (
      SELECT o_orderpriority,
             MIN(CASE WHEN cd >= 0.05 THEN o_totalprice END) AS lo,
             MIN(CASE WHEN cd >= 0.95 THEN o_totalprice END) AS hi
      FROM w GROUP BY o_orderpriority),
    j AS (
      SELECT o.o_orderpriority, o.o_totalprice, b.lo, b.hi,
             GREATEST(b.lo, LEAST(b.hi, o.o_totalprice)) AS clipped
      FROM orders o JOIN b ON b.o_orderpriority = o.o_orderpriority)
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 4) AS mean_raw,
           CAST(MIN(lo) AS DOUBLE) AS p05,
           CAST(MAX(hi) AS DOUBLE) AS p95,
           ROUND(CAST(SUM(CAST(ROUND(clipped, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 4) AS mean_winsorized,
           ROUND(CAST(SUM(CASE WHEN o_totalprice BETWEEN lo AND hi
                               THEN CAST(ROUND(o_totalprice, 6) AS DECIMAL(18,6))
                               END) AS DOUBLE)
                 / SUM(CASE WHEN o_totalprice BETWEEN lo AND hi
                            THEN 1 ELSE 0 END), 4) AS mean_trimmed,
           CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM j
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Robust per-group location estimates: 5%/95% winsorized and "
    "trimmed means of order totals per priority. Clip bounds are ANSI "
    "percentile_disc values (actual data points, so both engines clip "
    "on identical doubles — no interpolation-parity risk), attached by "
    "a broadcast join of the 5-row bound relation; all means are per-"
    "term-rounded DECIMAL sums. The outlier-hardened profile a cleaning "
    "pipeline reports next to raw means.",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    b = o.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    j = o.join(F.broadcast(b), "o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        "lo",
        "hi",
        F.greatest("lo", F.least("hi", F.col("o_totalprice"))).alias("clipped"),
    )
    dec = lambda c: F.round(c, 6).cast("decimal(18,6)")  # noqa: E731
    in_band = F.col("o_totalprice").between(F.col("lo"), F.col("hi"))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(dec(F.col("o_totalprice"))).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("mean_raw"),
            F.min("lo").cast("double").alias("p05"),
            F.max("hi").cast("double").alias("p95"),
            F.round(
                F.sum(dec(F.col("clipped"))).cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_winsorized"),
            F.round(
                F.sum(F.when(in_band, dec(F.col("o_totalprice")))).cast("double")
                / F.sum(F.when(in_band, 1).otherwise(0)),
                4,
            ).alias("mean_trimmed"),
            F.sum(
                F.when(
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped"),
        )
        .orderBy("o_orderpriority")
    )

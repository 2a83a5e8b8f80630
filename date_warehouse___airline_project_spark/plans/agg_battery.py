"""Aggregate-function and expression-surface batteries: argmax/argmin
aggregates, filtered counts, boolean aggregates, INTERSECT, regexp group
extraction, and calendar arithmetic.

Rounds out the aggregation surface beyond SURVEY §2.4 (the reference only
has max/count/dup-detection) the way any warehouse user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "argmax_customer_battery",
    oracle="""
    SELECT c_mktsegment,
           ARG_MAX(c_custkey, c_acctbal + c_custkey / 1e9) AS richest_custkey,
           ARG_MIN(c_custkey, c_acctbal + c_custkey / 1e9) AS poorest_custkey,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
           BOOL_OR(c_acctbal > 9000) AS any_very_rich,
           BOOL_AND(c_acctbal > -1000) AS all_above_neg1000
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="max_by/min_by (argmax), filtered count, bool_or/bool_and per "
    "segment. The argmax ordinate adds custkey/1e9 — far below the 0.01 "
    "acctbal granularity — as a deterministic unique tiebreak.",
)
def argmax_customer_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    ordinate = F.col("c_acctbal") + F.col("c_custkey") / 1e9
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_custkey", ordinate).alias("richest_custkey"),
            F.min_by("c_custkey", ordinate).alias("poorest_custkey"),
            F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_very_rich"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_neg1000"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "intersect_highvalue_building_custs",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY custkey
    """,
    doc="INTERSECT set op (completes the union/except/intersect triple).",
)
def intersect_highvalue_building_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("custkey"))
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return big.intersect(bld).orderBy("custkey")


@query(
    "regexp_part_name_groups",
    oracle="""
    SELECT REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS noun,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT REGEXP_EXTRACT(p_name, '^([a-z]+)', 1)) AS n_adjectives,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_retail
    FROM part
    GROUP BY 1
    ORDER BY noun
    """,
    doc="Regexp capture-group extraction feeding a grouped aggregate "
    "(SURVEY §2.8 generalized from validation-only regex to extraction).",
)
def regexp_part_name_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(F.regexp_extract("p_name", "([a-z]+)$", 1).alias("noun"))
        .agg(
            F.count("*").alias("n_parts"),
            F.count_distinct(F.regexp_extract("p_name", "^([a-z]+)", 1)).alias("n_adjectives"),
            F.sum(F.col("p_retailprice").cast(DEC)).cast("double").alias("total_retail"),
        )
        .orderBy("noun")
    )


@query(
    "calendar_arithmetic_orders",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
           STRFTIME(LAST_DAY(MIN(o_orderdate)), '%Y-%m-%d') AS first_order_month_end,
           STRFTIME(CAST(MAX(o_orderdate) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d')
               AS latest_plus_3mo,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY DATE_TRUNC('month', o_orderdate)
    ORDER BY order_month
    """,
    doc="Calendar arithmetic: date_trunc-month grouping, last_day, "
    "add_months (month-end-clamped in both engines).",
)
def calendar_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("_m"))
        .agg(
            F.date_format(F.last_day(F.min("o_orderdate")), "yyyy-MM-dd").alias(
                "first_order_month_end"
            ),
            F.date_format(F.add_months(F.max("o_orderdate"), 3), "yyyy-MM-dd").alias(
                "latest_plus_3mo"
            ),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.date_format("_m", "yyyy-MM-dd").alias("order_month"),
            "first_order_month_end",
            "latest_plus_3mo",
            "n_orders",
        )
        .orderBy("order_month")
    )


@query(
    "calendar_battery2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           STRFTIME(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           STRFTIME(CAST(o_orderdate AS DATE) +
                    CAST(CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                              ELSE (8 - isodow(o_orderdate)) % 7 END AS INTEGER),
                    '%Y-%m-%d') AS next_monday
    FROM orders
    WHERE o_orderkey % 89 = 0
    ORDER BY o_orderkey
    """,
    doc="Calendar battery 2: quarter, ISO week, day-of-year, ISO weekday "
    "(Spark weekday()+1 = DuckDB isodow), Monday week-truncation, and "
    "next_day('Mon') - the oracle emulates strictly-after next-Monday "
    "with isodow arithmetic.",
)
def calendar_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") % 89 == 0)
        .select(
            "o_orderkey",
            F.quarter(d).cast("long").alias("qtr"),
            F.weekofyear(d).cast("long").alias("iso_week"),
            F.dayofyear(d).cast("long").alias("doy"),
            (F.weekday(d) + 1).cast("long").alias("iso_dow"),
            F.date_format(F.trunc(d, "week"), "yyyy-MM-dd").alias("week_start"),
            F.date_format(F.next_day(d, "Mon"), "yyyy-MM-dd").alias("next_monday"),
        )
        .orderBy("o_orderkey")
    )

"""Scalar-function and cleaning-shaped queries (SURVEY.md §2.2, §2.8–2.11)
expressed over the driver testdata, each with a DuckDB oracle.

These exercise the exact function surface the reference's cleaners use —
regex validation, enum normalization, multi-format date parsing, currency
strip, rounding/clipping, md5 identity keys, JSON access — as pure
column expressions (JVM-side, whole-stage-codegen'd; no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "string_normalize_profile",
    oracle="""
    SELECT c_custkey,
           TRIM(c_name) AS name_trim,
           UPPER(c_name) AS name_upper,
           LOWER(c_name) AS name_lower,
           REGEXP_REPLACE(c_name, '\\s+', ' ', 'g') AS name_collapsed,
           REGEXP_REPLACE(c_name, '[^0-9]', '', 'g') AS name_digits,
           SUBSTRING(REGEXP_REPLACE(c_name, '[^A-Za-z0-9]', '', 'g'), 1, 2) AS name_prefix2,
           CASE WHEN REGEXP_MATCHES(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END AS name_valid
    FROM customer
    ORDER BY c_custkey
    """,
    doc="String function battery: trim/upper/lower/collapse/digits/prefix/regex "
    "(SURVEY §2.8 F-S1..S3, F-S6, F-S9, F-S13; §2.2 P2).",
)
def string_normalize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim("c_name").alias("name_trim"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_name").alias("name_lower"),
        F.regexp_replace("c_name", r"\s+", " ").alias("name_collapsed"),
        F.regexp_replace("c_name", "[^0-9]", "").alias("name_digits"),
        F.substring(F.regexp_replace("c_name", "[^A-Za-z0-9]", ""), 1, 2).alias("name_prefix2"),
        F.when(F.col("c_name").rlike("^Customer#[0-9]+$"), 1).otherwise(0).alias("name_valid"),
    ).orderBy("c_custkey")


@query(
    "multi_format_date_parse",
    oracle="""
    WITH formatted AS (
        SELECT o_orderkey,
               CASE o_orderkey % 3
                   WHEN 0 THEN STRFTIME(o_orderdate, '%Y-%m-%d')
                   WHEN 1 THEN STRFTIME(o_orderdate, '%m/%d/%Y')
                   ELSE STRFTIME(o_orderdate, '%d-%m-%Y')
               END AS raw_date
        FROM orders)
    SELECT o_orderkey, raw_date,
           STRFTIME(COALESCE(TRY_STRPTIME(raw_date, '%Y-%m-%d'),
                             TRY_STRPTIME(raw_date, '%m/%d/%Y'),
                             TRY_STRPTIME(raw_date, '%d-%m-%Y')), '%Y-%m-%d') AS iso_date
    FROM formatted
    ORDER BY o_orderkey
    """,
    doc="Multi-format date normalization via try-parse coalesce chain "
    "(SURVEY §2.9 F-D1/F-D2; reference cleaning.py:579-591 semantics).",
)
def multi_format_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import rebalance_compute

    # per-row date_format + three try_to_timestamp parses in the scan
    # stage; single-file scans plan one task (measured 1.6 s -> 0.8 s at
    # sf0.1/32 cores; no-op when the scan parallelizes on its own)
    o = rebalance_compute(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    )
    raw = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "MM/dd/yyyy"))
        .otherwise(F.date_format("o_orderdate", "dd-MM-yyyy"))
    )
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("raw_date"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("raw_date"), F.lit("MM/dd/yyyy")),
        F.try_to_timestamp(F.col("raw_date"), F.lit("dd-MM-yyyy")),
    )
    return (
        o.select("o_orderkey", raw.alias("raw_date"))
        .withColumn("iso_date", F.date_format(parsed, "yyyy-MM-dd"))
        .orderBy("o_orderkey")
    )


@query(
    "currency_clean_round_clip",
    oracle="""
    WITH noisy AS (
        SELECT l_orderkey, l_linenumber,
               '$' || CAST(l_extendedprice AS VARCHAR) AS money_str
        FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CAST(LEAST(ROUND(CAST(REGEXP_REPLACE(money_str, '[\\$,]', '', 'g') AS DOUBLE),
                            2),
                      99999999.99) AS DOUBLE) AS amount
    FROM noisy
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Currency strip → numeric coercion → round(2) → cap (SURVEY §2.8 F-S7, "
    "§2.10 F-M1..M3; reference cleaning.py:573-576).",
)
def currency_clean_round_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import rebalance_compute

    # decimal->string, concat, regexp strip and double coercion per row
    # run in the scan stage; single-file scans plan one task (measured
    # 2.2 s -> 1.3 s at sf0.1/32 cores with the rebalance; no-op when
    # the scan parallelizes on its own).
    li = rebalance_compute(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
    )
    money = F.concat(F.lit("$"), F.col("l_extendedprice").cast("string"))
    cleaned = F.regexp_replace(money, r"[\$,]", "").cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.round(cleaned, 2), F.lit(99999999.99)).cast("double").alias("amount"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "md5_identity_keys",
    oracle="""
    SELECT c_custkey,
           MD5(CONCAT(CAST(c_custkey AS VARCHAR), '|', c_name, '|', c_mktsegment)) AS customer_hash
    FROM customer
    ORDER BY c_custkey
    """,
    doc="MD5 surrogate identity hash (SURVEY §2.10 F-M11; functions.py:70-73).",
)
def md5_identity_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(
            F.concat(F.col("c_custkey").cast("string"), F.lit("|"), "c_name", F.lit("|"), "c_mktsegment")
        ).alias("customer_hash"),
    ).orderBy("c_custkey")


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON field extraction + agg (SURVEY §2.11 F-J1..J4; kafkaworker payload access).",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


@query(
    "validity_split_quarantine_counts",
    oracle="""
    SELECT CASE WHEN REGEXP_MATCHES(c_name, '^Customer#[0-9]{9}$')
                 AND c_acctbal IS NOT NULL
                 AND c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
            THEN 'clean' ELSE 'quarantine' END AS bucket,
           COUNT(*) AS n
    FROM customer
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Validity-split: one boolean expr, clean vs quarantine partition "
    "(SURVEY §2.2 P1/P2/P3/P4 — the core cleaner shape).",
)
def validity_split_quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    valid = (
        F.col("c_name").rlike("^Customer#[0-9]{9}$")
        & F.col("c_acctbal").isNotNull()
        & F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    )
    return (
        c.withColumn("bucket", F.when(valid, "clean").otherwise("quarantine"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@query(
    "enum_normalize_value_map",
    oracle="""
    SELECT CASE LOWER(TRIM(o_orderpriority))
               WHEN '1-urgent' THEN 'Urgent'
               WHEN '2-high' THEN 'High'
               WHEN '3-medium' THEN 'Medium'
               WHEN '4-not specified' THEN 'NotSpecified'
               WHEN '5-low' THEN 'Low'
               ELSE 'Unknown' END AS priority_norm,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY priority_norm
    """,
    doc="Enum/value-map normalization (SURVEY §2.2 P11; alliance map cleaning.py:348-358).",
)
def enum_normalize_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mapping = {
        "1-urgent": "Urgent",
        "2-high": "High",
        "3-medium": "Medium",
        "4-not specified": "NotSpecified",
        "5-low": "Low",
    }
    norm = F.lower(F.trim("o_orderpriority"))
    expr = F.lit("Unknown")
    for k, v in reversed(mapping.items()):
        expr = F.when(norm == k, v).otherwise(expr)
    return (
        o.select(expr.alias("priority_norm"))
        .groupBy("priority_norm")
        .agg(F.count("*").alias("n"))
        .orderBy("priority_norm")
    )


@query(
    "eligibility_verdicts",
    oracle="""
    WITH latest AS (
        SELECT user_id, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type = 'purchase')
    SELECT user_id,
           CAST(ROUND(value) AS BIGINT) AS delay_minutes,
           CASE WHEN value >= 120 THEN 1 ELSE 0 END AS eligible,
           CASE WHEN value >= 120 THEN 'delay_threshold_met'
                ELSE 'delay_below_threshold' END AS reason
    FROM latest WHERE rn = 1
    ORDER BY user_id
    """,
    doc="The eligibility query semantics (SURVEY §3.2): latest record per key, "
    "threshold verdict + reasons enum (server.js:238-303 shape).",
)
def eligibility_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.round("value").cast("bigint").alias("delay_minutes"),
            F.when(F.col("value") >= 120, 1).otherwise(0).alias("eligible"),
            F.when(F.col("value") >= 120, "delay_threshold_met")
            .otherwise("delay_below_threshold")
            .alias("reason"),
        )
        .orderBy("user_id")
    )


@query(
    "amount_consistency_check",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN ABS(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))
                         - CAST(l_extendedprice AS DECIMAL(18,2))) <= 0.01
                THEN 1 ELSE 0 END AS amounts_consistent
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Amount-consistency validation |a+b+c-total|<=tol (SURVEY §2.10 F-M8).",
)
def amount_consistency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import rebalance_compute

    # three DECIMAL multiplies + abs-compare per row in the scan stage;
    # single-file scans plan one task (measured 2.1 s -> 1.5 s at
    # sf0.1/32 cores; no-op when the scan parallelizes on its own)
    li = rebalance_compute(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
        )
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    charge = dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.abs(charge - dec("l_extendedprice")) <= 0.01, 1).otherwise(0).alias(
            "amounts_consistent"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "date_parts_and_age",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS order_dow,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2026-01-01') AS BIGINT) AS days_since
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Date-part extraction / trunc / diff (SURVEY §2.9 F-D2/F-D3/F-D6 family).",
)
def date_parts_and_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # DuckDB dow: Sunday=0. Spark dayofweek: Sunday=1 → subtract 1.
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2026-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_since"),
    ).orderBy("o_orderkey")

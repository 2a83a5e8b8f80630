"""Error-tolerant evaluation (`try_*`), URL decomposition, and bucketed
histograms — the defensive-SQL surface a warehouse user expects.

The reference's whole cleaning layer exists because raw inputs fail
casts (`pd.to_numeric(errors='coerce')` at cleaning.py:566, multi-format
dates at :579-591); Spark's `try_` family is the engine-native form of
the same "coerce, don't crash" policy, and the oracle mirrors each with
TRY_CAST / NULLIF arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "try_functions_battery",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(SPLIT_PART(o_orderpriority, '-', 1) AS BIGINT) AS prio_rank,
           TRY_CAST(o_orderstatus AS BIGINT) AS status_as_int,
           TRY_CAST(o_orderpriority AS DATE) IS NULL AS bad_date,
           o_totalprice / NULLIF(o_custkey % 5, 0) AS price_per_bucket,
           COALESCE(TRY_CAST(o_orderstatus AS BIGINT), -1) AS status_defaulted
    FROM orders
    WHERE o_orderkey % 101 = 0
    ORDER BY o_orderkey
    """,
    doc="try_cast / try_divide: malformed casts yield NULL instead of "
    "failing the job (the engine form of to_numeric(errors='coerce'), "
    "cleaning.py:566). try_divide's zero-denominator NULL is mirrored by "
    "NULLIF in the oracle; valid casts ('1-URGENT' prefix) round-trip.",
)
def try_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 101 == 0)
        .select(
            "o_orderkey",
            F.split_part("o_orderpriority", F.lit("-"), F.lit(1))
            .try_cast("bigint")
            .alias("prio_rank"),
            F.col("o_orderstatus").try_cast("bigint").alias("status_as_int"),
            F.col("o_orderpriority").try_cast("date").isNull().alias("bad_date"),
            F.try_divide("o_totalprice", F.col("o_custkey") % 5).alias("price_per_bucket"),
            F.coalesce(F.col("o_orderstatus").try_cast("bigint"), F.lit(-1)).alias(
                "status_defaulted"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "url_parse_battery",
    oracle="""
    SELECT doc_id,
           LOWER(source) || '.example.com' AS host,
           '/docs/' || lang || '/' || doc_id AS path,
           'q=' || lang || '&len=' || n_chars AS query_string,
           lang AS q_param,
           CAST(n_chars AS VARCHAR) AS len_param
    FROM documents
    WHERE doc_id % 11 = 0
    ORDER BY doc_id
    """,
    doc="parse_url HOST/PATH/QUERY plus per-parameter extraction, over "
    "URLs synthesized from document attributes; the oracle reconstructs "
    "each component relationally, so any parse drift (encoding, "
    "delimiter handling) fails the hash.",
)
def url_parse_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    url = F.concat(
        F.lit("https://"),
        F.lower("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id"),
        F.lit("?q="),
        F.col("lang"),
        F.lit("&len="),
        F.col("n_chars"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_string"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url(url, F.lit("QUERY"), F.lit("len")).alias("len_param"),
    ).orderBy("doc_id")


@query(
    "width_bucket_histogram",
    oracle="""
    WITH b AS (
        SELECT CASE WHEN o_totalprice < 0 THEN 0
                    WHEN o_totalprice >= 600000 THEN 21
                    ELSE 1 + CAST(FLOOR((o_totalprice - 0) * 20 / (600000 - 0))
                                  AS BIGINT) END AS bucket
        FROM orders
    )
    SELECT bucket,
           CAST(0 + bucket * 600000.0 / 20 AS DOUBLE) AS bucket_hi,
           COUNT(*) AS n
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-width histogram via width_bucket(price, 0, 600k, 20) — the "
    "oracle spells out the ANSI definition (0 below range, n+1 at/above "
    "the upper bound, floor-scaled otherwise) with the same FP "
    "expression shape so boundary rounding matches bit-for-bit.",
)
def width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(20))
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.lit(0) + F.col("bucket") * 600000.0 / 20).cast("double").alias("bucket_hi"),
            "n",
        )
        .orderBy("bucket")
    )

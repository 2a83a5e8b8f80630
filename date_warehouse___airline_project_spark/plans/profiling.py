"""Dataset profiling — the first stage of any training-data or warehouse
ingestion pipeline: per-column null rates, distinct cardinalities, and
range statistics in ONE pass over the table.

The single-pass shape matters at 100 TB: every statistic here is a
partial-aggregable expression, so the whole profile is one scan + one
1-row-per-group reduce — never a per-column loop of separate jobs.
(For distincts at extreme cardinality the same plan swaps COUNT(DISTINCT)
for approx_count_distinct — kept exact here for the oracle.)
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
    "profile_orders_columns",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS orderkey_nonnull,
           COUNT(DISTINCT o_custkey) AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           COUNT(DISTINCT o_orderpriority) AS priority_distinct,
           CAST(MIN(o_totalprice) AS DOUBLE) AS price_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS price_max,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS date_min,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS date_max,
           MIN(LENGTH(o_orderpriority)) AS priority_len_min,
           MAX(LENGTH(o_orderpriority)) AS priority_len_max
    FROM orders
    """,
    doc="Single-pass table profile: counts, null counts, distinct "
    "cardinalities, numeric/date/string ranges — one scan, one reduce.",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("orderkey_nonnull"),
        F.count_distinct("o_custkey").alias("custkey_distinct"),
        F.count_distinct("o_orderstatus").alias("status_distinct"),
        F.count_distinct("o_orderpriority").alias("priority_distinct"),
        F.min("o_totalprice").cast("double").alias("price_min"),
        F.max("o_totalprice").cast("double").alias("price_max"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("price_sum"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("date_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("date_max"),
        F.min(F.length("o_orderpriority")).alias("priority_len_min"),
        F.max(F.length("o_orderpriority")).alias("priority_len_max"),
    )


@query(
    "profile_documents_quality",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(n_chars) AS chars_min,
           MAX(n_chars) AS chars_max,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
           COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS n_short,
           COUNT(CASE WHEN text IS NULL OR TRIM(text) = '' THEN 1 END) AS n_empty
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Per-source corpus profile (doc counts, language spread, length "
    "distribution tails, empty-text rate) — the pre-dedup health check "
    "of a training-data pipeline.",
)
def profile_documents_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.min("n_chars").alias("chars_min"),
            F.max("n_chars").alias("chars_max"),
            F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("chars_total"),
            F.count_if(F.col("n_chars") < 100).alias("n_short"),
            F.count_if(F.col("text").isNull() | (F.trim("text") == "")).alias("n_empty"),
        )
        .orderBy("source")
    )

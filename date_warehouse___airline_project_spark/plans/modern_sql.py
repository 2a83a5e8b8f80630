"""Modern SQL surface: recursive CTEs and the VARIANT semi-structured type
(both Spark 4 features), each oracle-checked.

The recursive-CTE query runs as IDENTICAL text on Spark and DuckDB (the
ANSI-portable subset — EXTRACT, INTERVAL month stepping, ordinal GROUP BY),
which is itself a statement about the engine's SQL-compatibility surface,
like ``sql_surface.py``. The VARIANT query showcases schema-on-read over
the ``events.props`` JSON blobs: ``parse_json`` → binary variant →
``variant_get`` typed extraction — the Spark-4-native replacement for the
reference's ad-hoc ``JSON.parse`` fallbacks (backend/kafkaworker.js:47-52,
``raw_record JSONB`` at backend/server.js:65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query

# Identical text on both engines: month series via WITH RECURSIVE,
# left-joined against monthly revenue (gap months 0-filled).
_RECURSIVE_SQL = """
    WITH RECURSIVE months(m) AS (
        SELECT CAST('1995-01-01' AS DATE)
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
        FROM months WHERE m < CAST('1996-12-01' AS DATE)
    ),
    rev AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
    )
    SELECT CAST(EXTRACT(YEAR FROM m.m) AS BIGINT) AS y,
           CAST(EXTRACT(MONTH FROM m.m) AS BIGINT) AS mo,
           COALESCE(rev.revenue, CAST(0 AS DOUBLE)) AS revenue,
           COALESCE(rev.n_orders, 0) AS n_orders
    FROM months m LEFT JOIN rev
      ON EXTRACT(YEAR FROM m.m) = rev.y AND EXTRACT(MONTH FROM m.m) = rev.mo
    ORDER BY y, mo
"""


@query(
    "recursive_cte_monthly_series",
    oracle=_RECURSIVE_SQL,
    doc="WITH RECURSIVE month-series generation left-joined to monthly "
    "revenue (gap-filled) — IDENTICAL SQL text runs on Spark 4 and DuckDB.",
)
def recursive_cte_monthly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SQL)


@query(
    "variant_event_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="VARIANT semi-structured surface (Spark 4): parse_json(props) → "
    "variant_get('$.k') typed extraction, aggregated per event type; "
    "oracle uses DuckDB's native JSON extraction on the same blobs.",
)
def variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("CAST(variant_get(parse_json(props), '$.k', 'bigint') AS BIGINT)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "applyinpandas_order_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               DATE_DIFF('day',
                         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap
        FROM orders
    )
    SELECT o_custkey,
           COUNT(*) AS n_gaps,
           CAST(MEDIAN(gap) AS DOUBLE) AS median_gap_days,
           CAST(MIN(gap) AS BIGINT) AS min_gap,
           CAST(MAX(gap) AS BIGINT) AS max_gap
    FROM gaps
    WHERE gap IS NOT NULL
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    ORDER BY o_custkey
    LIMIT 500
    """,
    doc="Grouped-map Pandas operator (applyInPandas, Arrow-batched): "
    "per-customer order-cadence stats (operators/grouped_map.py). Integer "
    "day gaps make the median exact (worst case x.5) — bit-identical to "
    "the DuckDB window-LAG + MEDIAN oracle.",
)
def applyinpandas_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.grouped_map import order_gap_stats

    o = load_table(spark, sf_dir, "orders")
    return order_gap_stats(o).orderBy("o_custkey").limit(500)


_GROUP_BY_ALL_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@query(
    "sql_group_by_all_text",
    oracle=_GROUP_BY_ALL_SQL,
    doc="GROUP BY ALL + ORDER BY ALL (grouping keys inferred from the "
    "non-aggregate select list) - the modern-SQL shorthand both engines "
    "implement; IDENTICAL text runs on Spark 4 and DuckDB.",
)
def sql_group_by_all_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUP_BY_ALL_SQL)


_VALUES_JOIN_SQL = """
    SELECT v.code, v.label, COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN (VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending'))
         AS v(code, label)
      ON o.o_orderstatus = v.code
    GROUP BY v.code, v.label
    ORDER BY v.code
"""


@query(
    "sql_values_inline_lookup",
    oracle=_VALUES_JOIN_SQL,
    doc="Inline VALUES table constructor joined as a literal lookup "
    "(status code -> label) - the SQL form of the reference's in-code "
    "enum maps (cleaning.py:348-358); IDENTICAL text on both engines, "
    "and Catalyst broadcasts the 3-row relation.",
)
def sql_values_inline_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_VALUES_JOIN_SQL)

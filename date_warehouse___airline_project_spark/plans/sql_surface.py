"""Queries expressed through the ``spark.sql`` surface (rather than the
DataFrame DSL) over the registered testdata views — the engine exposes
both APIs over the same Catalyst plans (SURVEY §1: "DataFrame / Spark SQL").

The SQL text runs UNCHANGED in DuckDB as its own oracle: the revenue
forecast query is written in the ANSI-portable subset (explicit casts,
no engine-specific functions), which is itself a statement about the
engine's SQL compatibility surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table
from .registry import query

# TPC-H Q6-shaped: portable ANSI SQL, identical text on both engines.
_Q6_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "sql_forecast_revenue_change",
    oracle=_Q6_SQL,
    doc="TPC-H Q6 shape via the spark.sql surface — the SAME SQL text runs "
    "as the DuckDB oracle (ANSI-portable subset).",
)
def sql_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_SQL)


_CORRELATED_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query(
    "sql_priority_order_counts",
    oracle=_CORRELATED_SQL,
    doc="TPC-H Q4 shape: correlated EXISTS subquery (planned as a left-semi "
    "join by Catalyst) via the spark.sql surface; identical text oracles.",
)
def sql_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_CORRELATED_SQL)


_EXISTS_PAIR_SQL = """
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_late
    FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
                    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l.l_orderkey
                        AND l3.l_suppkey <> l.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY n_late DESC, s.s_suppkey
    LIMIT 20
"""


@query(
    "sql_exists_notexists_text",
    oracle=_EXISTS_PAIR_SQL,
    doc="TPC-H Q21 shape as LITERAL portable SQL through spark.sql — "
    "Catalyst performs the EXISTS/NOT-EXISTS decorrelation itself (vs the "
    "hand-planned aggregate rewrite in q21_sole_late_supplier); the SAME "
    "text is the DuckDB oracle.",
)
def sql_exists_notexists_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_EXISTS_PAIR_SQL)


_CORRELATED_SCALAR_SQL = """
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < (SELECT 0.5 * AVG(CAST(l2.l_quantity AS DOUBLE))
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@query(
    "sql_correlated_scalar_text",
    oracle=_CORRELATED_SCALAR_SQL,
    doc="TPC-H Q17 shape as literal portable SQL: correlated scalar AVG "
    "subquery decorrelated by Catalyst itself; identical text oracles.",
)
def sql_correlated_scalar_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CORRELATED_SCALAR_SQL)


_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o.o_orderkey, o.o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o.o_totalprice DESC, o.o_orderkey
             LIMIT 2) t
    WHERE c.c_acctbal > 9900
    ORDER BY c.c_custkey, t.o_orderkey
"""


@query(
    "sql_lateral_topn_text",
    oracle=_LATERAL_SQL,
    doc="Correlated LATERAL subquery with per-row ORDER BY ... LIMIT 2 "
    "(top-2 orders per rich customer) as literal portable SQL - the "
    "lateral-join form of the top-k-per-group pattern (SURVEY W3/O1); "
    "IDENTICAL text runs on Spark 4 and DuckDB.",
)
def sql_lateral_topn_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# NOT IN three-valued-logic semantics. A NULL in the NOT-IN subquery makes
# the predicate UNKNOWN for every non-matching row, so the count collapses
# to 0 — a classic correctness trap both engines must agree on. The three
# counts pin plain NOT IN, NOT IN with an injected NULL, and IN with the
# same NULL (which is unaffected for matching rows).
# ---------------------------------------------------------------------------
# The NULL is injected UNCONDITIONALLY (UNION ALL SELECT CAST(NULL ...)),
# not by rewriting an existing row, so the three-valued-logic case is
# exercised on any dataset regardless of which keys exist.
_NOT_IN_NULLS_SQL = """
    SELECT
      (SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)) AS not_in_plain,
      (SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 400000
           UNION ALL SELECT CAST(NULL AS BIGINT))) AS not_in_with_null,
      (SELECT COUNT(*) FROM customer
        WHERE c_custkey IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 400000
           UNION ALL SELECT CAST(NULL AS BIGINT))) AS in_with_null
"""


@query(
    "sql_not_in_null_semantics",
    oracle=_NOT_IN_NULLS_SQL,
    doc="ANSI three-valued NOT IN / IN with NULLs in the subquery "
    "(null-aware anti join in Catalyst); IDENTICAL SQL text both engines.",
)
def sql_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_NOT_IN_NULLS_SQL)

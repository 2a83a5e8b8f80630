"""Remaining TPC-H-shaped analytic queries (Q9/Q10/Q12/Q14 shapes) plus the
explicit skew-salted join demo.

These complete the classic decision-support surface beyond what
``relational.py`` / ``subqueries.py`` / ``sql_surface.py`` already cover:
multi-way star joins with derived measures (Q9), grouped top-k over a
returned-item filter (Q10), conditional CASE aggregation (Q12), and a
share-of-total over a predicate split (Q14). The testdata star schema has
no ``partsupp``, so Q9's supply cost is a deterministic derived measure
(60% of ``p_retailprice``) — the *shape* (6-way join, signed profit
expression, year extraction, two-level grouping) is what's exercised.

Reference parity: the reference's analytics are pandas groupbys inside
cleaning (backend/etl_scripts/cleaning.py) and supabase-delegated lookups
(backend/server.js:212) — none of these shapes exist there; they are the
engine-completeness surface SURVEY §2.4/§2.6 calls for.

All money math in DECIMAL(18,2), cast DOUBLE at the edge; every ordering
carries a unique tie-break key (see registry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.catalog import load_table
from .registry import query

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q9 shape: profit by (supplier nation, order year). lineitem joins part
# (filtered — pushed to the parquet scan), supplier, nation (all broadcast
# dims), and orders (shuffle join on orderkey, AQE-sized). Profit is a
# signed decimal expression; the groupBy shuffles once on (nation, year).
# ---------------------------------------------------------------------------
@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                    - (CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(2,1)))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: 5-way star join, signed decimal profit measure, "
    "two-level grouping (supply cost derived as 0.6*p_retailprice — no "
    "partsupp in the testdata).",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    one = F.lit(1).cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    qty = F.col("l_quantity").cast(DEC)
    cost = F.col("p_retailprice").cast(DEC) * F.lit(0.6).cast("decimal(2,1)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            n.n_name.alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(price * (one - disc) - cost * qty).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q10 shape: revenue lost to returns per customer in one quarter, top 20.
# orders filtered on the quarter (partition-prunable at scale), lineitem
# filtered to returnflag='R' at the scan; customer+nation broadcast.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, quarter "
    "window, grouped top-20 (TakeOrderedAndProject).",
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    one = F.lit(1).cast(DEC)
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(c.c_custkey, c.c_name, c.c_acctbal, n.n_name.alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "nation",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: conditional CASE aggregation — one pass, two counters per
# group. The testdata has no l_shipmode, so returnflag is the grouping
# axis and order priority the CASE predicate (same plan shape: join +
# single hash agg with two conditional sums).
# ---------------------------------------------------------------------------
@query(
    "q12_priority_line_counts",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: join + conditional CASE aggregation (two "
    "counters in one hash-agg pass).",
)
def q12_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q14 shape: share-of-total with a predicate split. Numerator and
# denominator are exact decimal sums from the SAME single agg pass (no
# second scan); the ratio is taken in double space at the edge.
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share — predicate-split numerator "
    "and full denominator from one agg pass, ratio in double at the edge.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    one = F.lit(1).cast(DEC)
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    zero = F.lit(0).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Explicit skew-salted join (operators/skew.py). The salt changes only the
# physical shuffle distribution — the plain join is the oracle. Grouped
# per-nation volume afterwards so the output is small and stable.
# ---------------------------------------------------------------------------
@query(
    "salted_join_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Skew-salted join (operators/skew.py::salted_join): big side salted "
    "8 ways on a row hash, dim exploded 8x, join on (key, salt) — identical "
    "result to the plain join (the oracle), bounded worst-reducer load.",
)
def salted_join_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    joined = salted_join(
        li.withColumnRenamed("l_suppkey", "s_suppkey"),
        s,
        on=["s_suppkey"],
        n_salts=8,
        salt_src=F.xxhash64("l_orderkey", "l_linenumber"),
    )
    return (
        joined.join(F.broadcast(n), joined.s_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("volume"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Q4 shape: order-priority count with a correlated EXISTS against lineitem
# (orders in one quarter having a late-shipped line). The testdata lineitem
# has no commit/receipt dates, so "late" is l_shipdate > o_orderdate + 60d —
# same correlated-EXISTS-with-inequality shape, planned as a left-semi hash
# join on l_orderkey with the date predicate in the join condition.
# ---------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: priority counts for one quarter's orders having at "
    "least one line shipped more than 60 days after ordering - correlated "
    "EXISTS with an inequality, planned as a left-semi hash join.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )

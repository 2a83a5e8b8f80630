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
from pyspark.sql.window import Window as W

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


# ---------------------------------------------------------------------------
# Q6 shape: single-table predicate aggregation. All three predicates reach
# the parquet scan (PushedFilters); one partial+final agg, no shuffle of
# row data — the canonical "scan-side" query.
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-side predicate aggregation — date range, "
    "discount band, quantity cap all pushed to the parquet reader; one "
    "map-side partial sum. The cheapest possible plan at any scale.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations. Supplier and customer
# nations are both tiny broadcast dims; lineitem joins orders (the only
# real shuffle), and the nation-pair predicate prunes early because both
# dim joins are inner on the two-nation subset.
# ---------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by ship "
    "year. Nation-filtered supplier/customer dims broadcast; the only data "
    "shuffle is lineitem-orders on orderkey; disjunctive nation-pair "
    "predicate applied after both dim joins.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    one = F.lit(1).cast(DEC)
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share. The nation-of-interest's revenue share
# within one region's market for one part type, by order year. Numerator
# and denominator come from the SAME single agg pass (conditional sum),
# exactly like Q14 — no second scan, no self-join.
# ---------------------------------------------------------------------------
@query(
    "q8_national_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CASE WHEN n1.n_name = 'NATION_7'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS DOUBLE) AS mkt_share,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_volume
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY EXTRACT(year FROM o.o_orderdate)
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: 7-way star join, market share of one supplier "
    "nation within a region's market for one part type — numerator and "
    "denominator from a single conditional-sum agg pass per order year.",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"), "left_semi")
        .select("c_custkey")
    )
    one = F.lit(1).cast(DEC)
    zero = F.lit(0).cast(DEC)
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    nat_rev = F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (F.sum(nat_rev).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("mkt_share"),
            F.sum(rev).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part within a region. The testdata
# has no partsupp, so the part-supplier offer relation is DERIVED from
# lineitem as the minimum observed unit price per (partkey, suppkey) —
# both engines compute the identical IEEE division and MIN, so the values
# (and the min-cost equality join) match exactly. Two scale moves: the
# part filter is pushed INTO lineitem as a broadcast semi-join BEFORE the
# (partkey, suppkey) agg, so the big shuffle carries only offers for
# qualifying parts (~0.4% of partkeys — at 100 TB this is the difference
# between shuffling the fact table and shuffling a sliver); and the
# per-part regional minimum is a window keyed on p_partkey over the
# already-tiny offers relation, which decorrelates Q2's scalar subquery
# with ONE pass over offers instead of an agg + self-join that re-derives
# the offers subtree twice.
# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    offers AS (
      SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name AS nation,
             CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, ps.ps_supplycost
      FROM ps
      JOIN part p     ON p.p_partkey = ps.l_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size = 5 AND p.p_type = 'LARGE'
    )
    SELECT o.s_acctbal, o.s_name, o.nation, o.p_partkey, o.p_brand,
           CAST(o.ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM offers o
    JOIN (SELECT p_partkey, MIN(ps_supplycost) AS min_cost
          FROM offers GROUP BY p_partkey) m
      ON m.p_partkey = o.p_partkey AND o.ps_supplycost = m.min_cost
    ORDER BY o.s_acctbal DESC, o.nation, o.s_name, o.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: min-cost supplier per part within a region. "
    "partsupp derived from lineitem (MIN unit price per part-supplier "
    "pair); correlated scalar-min subquery decorrelated into a keyed agg "
    "+ equality join back; region/nation/part dims broadcast; top-100 by "
    "account balance with full tiebreak.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "LARGE")
    )
    # prune the fact-table agg to qualifying parts BEFORE the shuffle:
    # per-(partkey, suppkey) minima are group-local, so restricting the
    # groups to the parts the offers join keeps anyway is a no-op on the
    # result and removes >99% of the aggregation's shuffle volume.
    ps = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            n.n_name.alias("nation"),
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "ps_supplycost",
        )
    )
    w = W.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )

"""Deep subquery shapes (TPC-H Q13/Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22 adapted
to the driver star schema — no partsupp table, so inventory-flavored
queries are re-based on lineitem).

These cover the subquery surface the reference never had but any warehouse
user expects: scalar subqueries (correlated and global), IN / NOT IN,
EXISTS / NOT EXISTS with multiple correlations, and aggregates of
aggregates. Every Spark plan expresses the subquery as the join Catalyst
would plan for it (broadcast scalar, left-semi, left-anti) so the physical
strategy is explicit and scale-safe: small sides broadcast, fact-fact
shuffles only on the natural join key.

Numeric policy follows plans/relational.py: money in DECIMAL(18,2), cast
to DOUBLE at the output edge only.
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
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: distribution of per-customer order counts — a "
    "left outer join feeding an aggregate of an aggregate.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # COUNT(o_orderkey) counts matches only: count non-null keys after the
    # outer join. Second agg is over ~|customer| rows — trivially small.
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: revenue view + scalar MAX subquery over the view. "
    "The comparison runs on exact DECIMAL sums so equality is sound.",
)
def q15_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(price * (one - disc)).alias("total_rev"))
    )
    top = rev.agg(F.max("total_rev").alias("_max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_counts_not_in",
    oracle="""
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    LIMIT 40
    """,
    doc="TPC-H Q16 shape: COUNT(DISTINCT) with a NOT IN subquery, planned "
    "as a broadcast left-anti join (s_suppkey is non-null so NOT IN ≡ anti).",
)
def q16_supplier_counts_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
        .limit(40)
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
               AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * AVG(CAST(l2.l_quantity AS DOUBLE))
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated scalar AVG subquery per part, planned "
    "as a per-part aggregate joined back to the fact (one shuffle on "
    "l_partkey reused by the re-join under AQE).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # The correlated subquery scans ALL lineitems per part (not just Brand#1
    # rows) — the per-part average must aggregate the unfiltered fact.
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.5) * F.avg(F.col("l_quantity").cast("double"))).alias("_half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: IN over a GROUP BY ... HAVING subquery, planned "
    "as a left-semi join against the qualifying-order aggregate.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    big = li.groupBy("l_orderkey").agg(F.sum(qty).alias("_sq")).filter(F.col("_sq") > 200)
    return (
        o.join(big.select("l_orderkey"), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_matched
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs mixing join-side and fact-side "
    "predicates — exercises CNF conversion / partial pushdown.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(price * (one - disc)).cast("double").alias("revenue"),
            F.count("*").alias("n_matched"),
        )
    )


@query(
    "q20_nested_in_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape: two-level nested IN (part-name filter inside a "
    "grouped HAVING inside a semi-join) — semi-join chain in Spark.",
)
def q20_nested_in_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    heavy = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_sq"))
        .filter(F.col("_sq") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
    doc="TPC-H Q21 shape: EXISTS + correlated NOT EXISTS. Spark plan "
    "rewrites both subqueries as one per-order aggregate (distinct "
    "suppliers vs distinct LATE suppliers) — a single extra shuffle on "
    "l_orderkey instead of two correlated probes per row.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lio = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = lio.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count_distinct("l_suppkey").alias("_n_supp"),
        F.count_distinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late_supp"),
    )
    # l1 late AND another supplier exists AND no OTHER supplier late
    #   ⇔ l1 late, _n_supp > 1, _n_late_supp == 1 (the late one is l1's).
    return (
        lio.filter(F.col("_late"))
        .join(per_order, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(CAST(c2.c_acctbal AS DOUBLE))
                         FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape: global scalar AVG subquery + NOT EXISTS anti-join "
    "— customers richer than the positive-balance average who have been "
    "dormant (no orders) since 2000.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg(F.col("c_acctbal").cast("double")).alias("_avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q11_supplier_value_share",
    oracle="""
    WITH val AS (
      SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, CAST(v AS DOUBLE) AS supp_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) * 0.005 FROM val)
    ORDER BY supp_value DESC, l_suppkey
    """,
    doc="TPC-H Q11 shape (re-based on lineitem value — no partsupp table): "
    "suppliers holding more than 0.5% of total traded value; scalar "
    "fraction-of-total subquery over the same aggregate view.",
)
def q11_supplier_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_suppkey").agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("v"))
    total = val.agg((F.sum("v").cast("double") * 0.005).alias("_cut"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("_cut"))
        .select("l_suppkey", F.col("v").cast("double").alias("supp_value"))
        .orderBy(F.desc("supp_value"), "l_suppkey")
    )

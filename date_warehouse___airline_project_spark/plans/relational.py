"""Core relational operator queries (SURVEY.md §2.1–2.7) over the driver
testdata star schema, each paired with its DuckDB oracle SQL.

Numeric policy: money aggregates are computed in DECIMAL (exact, associative
— safe under any partitioning / AQE re-ordering at 100 TB) and cast to
DOUBLE only at output. Averages divide the exact decimal sum by the count
in double space. This makes Spark and DuckDB bit-identical.

Timestamp policy: emitted as 'yyyy-MM-dd[ HH:mm:ss]' strings (second
granularity) — sidesteps ns-vs-µs parquet precision differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (§2.4) — flagship: TPC-H Q1-shaped pricing summary.
# Scan → filter (pushed to parquet) → partial/final hash agg → sort.
# One shuffle on (returnflag, linestatus): minimal and unavoidable.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Grouped aggregation surface (SURVEY §2.4 A1/A2 generalized; TPC-H Q1 shape).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    one = F.lit(1).cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Joins (§2.3) — fact-fact-dim join with grouped top-k.
# customer is broadcast (small dim at every SF); orders⋈lineitem shuffles on
# the join key which AQE sizes at runtime.
# ---------------------------------------------------------------------------
@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="Equi-join chain + grouped agg + top-k (SURVEY §2.3 J3/J4 shape, §2.6 O1).",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(li.l_orderkey.alias("o_orderkey"), o.o_orderdate, o.o_orderpriority)
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_region_nation_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region_name, nation_name
    """,
    doc="Snowflake dim chain resolved via broadcast joins (SURVEY §2.3 J4).",
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    # Collapse the dim chain driver-side-free: three broadcast hash joins, no
    # shuffle of the fact until the final (tiny-key) aggregation.
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(price * (one - disc)).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "semi_join_customers_with_big_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    ORDER BY c_custkey
    """,
    doc="Left-semi join = the reference's dim-membership validation (SURVEY §2.3 J1).",
)
def semi_join_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    doc="Left-anti join = quarantine complement selection (SURVEY §2.7 U2): "
    "customers with no single order above 400k (non-empty at every SF).",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Windows (§2.5) — top-1-by-recency per key (the eligibility lookup shape)
# and keep-first dedup. Shuffle on the partition key only.
# ---------------------------------------------------------------------------
@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    doc="Top-1 by recency per key (SURVEY §2.5 W3: ORDER BY desc LIMIT 1 per flight).",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .orderBy("o_custkey")
    )


@query(
    "dedup_orders_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey, STRFTIME(o_orderdate, '%Y-%m')
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    ORDER BY o_orderkey
    """,
    doc="keep='first' dedup on a key with deterministic order (SURVEY §2.4 A4 / §2.5 W2).",
)
def dedup_orders_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey", F.date_format("o_orderdate", "yyyy-MM")).orderBy(
        "o_orderdate", "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "running_totalprice_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Window frame (running sum) — the frame-spec surface the reference lacks.",
)
def running_totalprice_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.withColumn("running_total", F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6) and duplicate detection (§2.4 A3/A5).
# ---------------------------------------------------------------------------
@query(
    "topk_recent_events",
    oracle="""
    SELECT event_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 5
    """,
    doc="ORDER BY recency LIMIT 5 — the live-feed query (SURVEY §2.6 O2/W4).",
)
def topk_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # TakeOrderedAndProject: per-partition top-5 then driver merge — no global sort.
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(5)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "user_id",
            "event_type",
            "value",
        )
    )


@query(
    "duplicate_key_pairs",
    oracle="""
    SELECT o_custkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate, COUNT(*) AS n_dupes
    FROM orders
    GROUP BY o_custkey, o_orderdate
    HAVING COUNT(*) > 1
    ORDER BY o_custkey, orderdate
    """,
    doc="Duplicate-group enumeration (SURVEY §2.4 A5 detect_duplicate_records).",
)
def duplicate_key_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.count("*").alias("n_dupes"))
        .filter(F.col("n_dupes") > 1)
        .orderBy("o_custkey", "orderdate")
    )


@query(
    "distinct_dedup_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_quantity
    """,
    doc="Exact-row dedup via DISTINCT (SURVEY §2.4 A3).",
)
def distinct_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_quantity")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "l_quantity")
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7).
# ---------------------------------------------------------------------------
@query(
    "set_ops_high_value_not_building",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY o_custkey
    """,
    doc="EXCEPT set op (SURVEY §2.7 U1/U2 complement semantics).",
)
def set_ops_high_value_not_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    # subtract == SQL EXCEPT (distinct, removes all occurrences present on the right)
    return big.subtract(bld).orderBy("o_custkey")


@query(
    "union_event_users",
    oracle="""
    SELECT DISTINCT user_id, 'purchase_or_error' AS cohort FROM events
    WHERE event_type IN ('purchase', 'error')
    ORDER BY user_id
    """,
    doc="Union + set-membership predicate (SURVEY §2.2 P4, §2.7 U1).",
)
def union_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return (
        a.union(b)
        .distinct()
        .withColumn("cohort", F.lit("purchase_or_error"))
        .orderBy("user_id")
    )


@query(
    "nation_pair_trade_volume",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    ORDER BY cust_nation, supp_nation, ship_year
    """,
    doc="TPC-H Q7 shape: five-way join across both fact paths (customer "
    "nation × supplier nation) with a cross-filter; dims broadcast, one "
    "fact-fact shuffle on orderkey.",
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    cust_side = c.join(F.broadcast(n1), c.c_nationkey == F.col("_ck")).filter(
        F.col("cust_nation").isin("NATION_1", "NATION_2")
    )
    supp_side = s.join(F.broadcast(n2), s.s_nationkey == F.col("_sk")).filter(
        F.col("supp_nation").isin("NATION_1", "NATION_2")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_side), o.o_custkey == cust_side.c_custkey)
        .join(F.broadcast(supp_side), li.l_suppkey == supp_side.s_suppkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(F.sum(price * (one - disc)).cast("double").alias("volume"))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@query(
    "brand_share_by_year",
    oracle="""
    WITH sales AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
             p.p_brand,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT order_year,
           CAST(SUM(CASE WHEN p_brand = 'Brand#1' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS brand1_rev,
           CAST(SUM(rev) AS DOUBLE) AS total_rev,
           CAST(ROUND(SUM(CASE WHEN p_brand = 'Brand#1' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END)
                      / SUM(rev), 6) AS DOUBLE) AS brand1_share
    FROM sales
    GROUP BY order_year
    ORDER BY order_year
    """,
    doc="TPC-H Q8 shape: conditional aggregation computing a market share "
    "per year (CASE inside SUM — one pass, no self-join).",
)
def brand_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import rebalance_compute

    # the broadcast part-join probe + DECIMAL revenue terms evaluate in
    # the lineitem scan stage; single-file scans plan one task (measured
    # 1.6 s -> 1.3 s at sf0.1/32 cores; no-op when the scan
    # parallelizes on its own)
    li = rebalance_compute(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
        )
    )
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    one = F.lit(1).cast(DEC)
    rev = price * (one - disc)
    zero = F.lit(0).cast(DEC)
    brand1 = F.when(F.col("p_brand") == "Brand#1", rev).otherwise(zero)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.sum(brand1).cast("double").alias("brand1_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
            F.round(F.sum(brand1) / F.sum(rev), 6).cast("double").alias("brand1_share"),
        )
        .orderBy("order_year")
    )


@query(
    "cheapest_part_supplier",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           CAST(MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    HAVING MIN(CAST(l.l_extendedprice AS DECIMAL(18,2)))
           <= (SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2))) * 1.01
               FROM lineitem l2)
    ORDER BY min_price, p.p_partkey
    LIMIT 20
    """,
    doc="Scalar subquery against a global aggregate (TPC-H Q2 shape): parts "
    "whose best price is within 1% of the global minimum.",
)
def cheapest_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    # scalar subquery = single-row broadcast join (what Catalyst plans for
    # an uncorrelated scalar subquery)
    global_min = li.agg((F.min(price) * 1.01).alias("_cutoff"))
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.min(price).alias("_min_dec"))
    )
    return (
        per_part.crossJoin(F.broadcast(global_min))
        .filter(F.col("_min_dec") <= F.col("_cutoff"))
        .select("p_partkey", "p_name", F.col("_min_dec").cast("double").alias("min_price"))
        .orderBy("min_price", "p_partkey")
        .limit(20)
    )


@query(
    "market_share_by_segment",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS seg_total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment)
    SELECT segment,
           CAST(seg_total AS DOUBLE) AS seg_total,
           CAST(ROUND(seg_total / SUM(seg_total) OVER (), 6) AS DOUBLE) AS share
    FROM seg
    ORDER BY segment
    """,
    doc="Share-of-total via an unpartitioned window over a pre-aggregated "
    "frame (5 rows — the window is over the agg, never the fact).",
)
def market_share_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(38,2)").alias("seg_total"))
    )
    w = W.partitionBy()
    return seg.select(
        "segment",
        F.col("seg_total").cast("double").alias("seg_total"),
        F.round(F.col("seg_total") / F.sum("seg_total").over(w), 6)
        .cast("double")
        .alias("share"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Grouping sets / rollup — grouped-agg generalization (free in Spark, judged
# as engine surface).
# ---------------------------------------------------------------------------
@query(
    "rollup_revenue_region_nation",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name, nation_name
    """,
    doc="ROLLUP hierarchical aggregation over the dim chain.",
)
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_acctbal"),
            F.count("*").alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "total_acctbal",
            "n_customers",
        )
        .orderBy("region_name", "nation_name")
    )

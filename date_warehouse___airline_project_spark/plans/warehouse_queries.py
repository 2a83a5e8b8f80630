"""SCD2 warehouse query: a two-batch dimension merge expressed as a pure
function of the ``customer`` table, with a full SQL oracle replicating the
effective-dating semantics (close-old / open-new / insert-new / no-op).

Batches are derived deterministically:
  batch1 (t1) — every customer with their market segment
  batch2 (t2) — segment forced to MACHINERY for custkey % 7 == 0 (an
                update for those not already MACHINERY), plus synthetic
                new keys custkey + 10,000,000 for custkey % 97 == 0
                (exercising the insert path)

Expected final dim (what both engines compute independently):
  changed keys    → a closed row [t1, t2) + an open row [t2, ∞)
  unchanged keys  → one open row [t1, ∞)
  new keys        → one open row [t2, ∞)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd2 import scd2_init, scd2_merge
from ..sources.catalog import load_table
from .registry import query

T1, T2 = "2026-01-01 00:00:00", "2026-02-01 00:00:00"

_SCD2_ORACLE = f"""
    WITH b1 AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer),
    b2 AS (
      SELECT c_custkey AS custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS segment
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, 'NEWSEGMENT' FROM customer WHERE c_custkey % 97 = 0),
    changed AS (
      SELECT b2.custkey, b2.segment AS new_seg, b1.segment AS old_seg
      FROM b2 JOIN b1 USING (custkey) WHERE b1.segment <> b2.segment),
    new_keys AS (
      SELECT b2.custkey, b2.segment FROM b2
      WHERE custkey NOT IN (SELECT custkey FROM b1))
    SELECT custkey, old_seg AS segment,
           '{T1}' AS valid_from, '{T2}' AS valid_to, FALSE AS is_current
    FROM changed
    UNION ALL
    SELECT custkey, new_seg, '{T2}', NULL, TRUE FROM changed
    UNION ALL
    SELECT b1.custkey, b1.segment, '{T1}', NULL, TRUE
    FROM b1 WHERE b1.custkey NOT IN (SELECT custkey FROM changed)
    UNION ALL
    SELECT custkey, segment, '{T2}', NULL, TRUE FROM new_keys
    ORDER BY custkey, valid_from
"""


@query(
    "scd2_dim_two_batches",
    oracle=_SCD2_ORACLE,
    doc="SCD Type 2 merge over two deterministic batches: close-old/open-new "
    "on change, insert on new key, no-op otherwise (SURVEY §2.3 J4; "
    "table_configs.json scdType 2 semantics).",
)
def scd2_dim_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    b1 = c.select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
    b2 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_custkey") % 7 == 0, "MACHINERY")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    ).unionByName(
        c.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("custkey"),
            F.lit("NEWSEGMENT").alias("segment"),
        )
    )
    dim = scd2_init(b1, T1)
    dim = scd2_merge(dim, b2, ["custkey"], ["segment"], T2)
    return dim.select(
        "custkey",
        "segment",
        F.date_format("_valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("_valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("_is_current").alias("is_current"),
    ).orderBy("custkey", "valid_from")


# ---------------------------------------------------------------------------
# Point-in-time dimensional lookup (the read side of SCD2; SURVEY §2.3 J4,
# reference backend/server.js:370-375 "dimensional lookups"). The dim above
# is effective-dated in 2026 — after every order — so the PIT query builds
# the same two-batch dim on dates inside the order range: versions flip at
# T2P, so orders before T2P for changed keys resolve to the CLOSED version
# (old segment) and later orders to the open one.
# ---------------------------------------------------------------------------

T1P, T2P = "1995-01-01 00:00:00", "1998-06-01 00:00:00"

_PIT_ORACLE = f"""
    WITH b1 AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer),
    b2 AS (
      SELECT c_custkey AS custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS segment
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, 'NEWSEGMENT' FROM customer WHERE c_custkey % 97 = 0),
    changed AS (
      SELECT b2.custkey, b2.segment AS new_seg, b1.segment AS old_seg
      FROM b2 JOIN b1 USING (custkey) WHERE b1.segment <> b2.segment),
    new_keys AS (
      SELECT b2.custkey, b2.segment FROM b2
      WHERE custkey NOT IN (SELECT custkey FROM b1)),
    dim AS (
      SELECT custkey, old_seg AS segment,
             TIMESTAMP '{T1P}' AS valid_from,
             TIMESTAMP '{T2P}' AS valid_to, FALSE AS is_current
      FROM changed
      UNION ALL
      SELECT custkey, new_seg, TIMESTAMP '{T2P}', CAST(NULL AS TIMESTAMP), TRUE FROM changed
      UNION ALL
      SELECT b1.custkey, b1.segment, TIMESTAMP '{T1P}', CAST(NULL AS TIMESTAMP), TRUE
      FROM b1 WHERE b1.custkey NOT IN (SELECT custkey FROM changed)
      UNION ALL
      SELECT custkey, segment, TIMESTAMP '{T2P}', CAST(NULL AS TIMESTAMP), TRUE FROM new_keys)
    SELECT d.segment AS segment_at_order,
           d.is_current AS version_is_current,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
    FROM orders o
    JOIN dim d ON o.o_custkey = d.custkey
      AND o.o_orderdate >= d.valid_from
      AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@query(
    "fact_at_event_time",
    oracle=_PIT_ORACLE,
    doc="Point-in-time SCD2 lookup: each order joins the dim VERSION valid "
    "at o_orderdate (key equality + effective-date range), aggregated by "
    "segment-at-order-time and version currency (SURVEY §2.3 J4 read side; "
    "server.js:370-375 dimensional lookups). The natural-key equality "
    "carries the shuffle — the date range is a post-join filter, never a "
    "BNLJ on the fact side.",
)
def fact_at_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    b1 = c.select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
    b2 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_custkey") % 7 == 0, "MACHINERY")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    ).unionByName(
        c.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("custkey"),
            F.lit("NEWSEGMENT").alias("segment"),
        )
    )
    dim = scd2_merge(scd2_init(b1, T1P), b2, ["custkey"], ["segment"], T2P)
    joined = o.join(
        dim,
        (F.col("o_custkey") == F.col("custkey"))
        & (F.col("o_orderdate") >= F.col("_valid_from"))
        & (F.col("_valid_to").isNull() | (F.col("o_orderdate") < F.col("_valid_to"))),
    )
    return (
        joined.groupBy(
            F.col("segment").alias("segment_at_order"),
            F.col("_is_current").alias("version_is_current"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "sum_totalprice"
            ),
        )
        .orderBy("segment_at_order", "version_is_current")
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance. The MV is monthly order
# revenue; the "already materialized" base covers orders before the
# cutoff and the delta batch covers the rest. Maintenance merges the two
# PARTIAL aggregates (count/sum are algebraic: merge = cell-wise SUM of
# the partials) — the delta-only upkeep pattern that makes a 100 TB MV
# affordable: the base partial is never rescanned, and the oracle's full
# recompute certifies merged == recomputed.
# ---------------------------------------------------------------------------

_MV_CUTOFF = "1997-01-01"

_MV_ORACLE = f"""
    SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '{_MV_CUTOFF}'
                               THEN 0 ELSE 1 END) AS n_partials
    FROM orders
    GROUP BY 1
    ORDER BY month
"""


@query(
    "mv_incremental_monthly_revenue",
    oracle=_MV_ORACLE,
    doc=f"Incremental materialized-view maintenance: the monthly-revenue MV "
    f"is kept as mergeable partials (count, DECIMAL sum), the base partial "
    f"covers orders before {_MV_CUTOFF} and the delta batch after; "
    f"maintenance is a cell-wise SUM merge of partials — the base is "
    f"never rescanned (both scans are date-pruned; at scale the delta "
    f"scan touches only new partitions). The oracle recomputes the MV "
    f"from scratch, certifying merged == recomputed; n_partials pins "
    f"that boundary months really saw both batches.",
)
def mv_incremental_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")

    def partial(df: DataFrame, batch_id: int) -> DataFrame:
        return df.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.lit(batch_id).alias("batch"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff), 0)
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff), 1)
    return (
        base.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("cnt").alias("order_cnt"),
            F.sum("rev").cast("double").alias("revenue"),
            F.countDistinct("batch").alias("n_partials"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Late-arriving dimension reconciliation (the classic warehouse headache the
# reference's SCD2 config implies): dim state A is missing 20% of keys (they
# arrive late) and state B additionally retro-corrects segments at T2P.
# Facts point-in-time-resolved against BOTH states; rows whose event-time
# version changed are classified and aggregated.
# ---------------------------------------------------------------------------

_RECON_ORACLE = f"""
    WITH b1 AS (
      SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer
      WHERE c_custkey % 5 <> 0),
    b2 AS (
      SELECT c_custkey AS custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS segment
      FROM customer
      UNION ALL
      SELECT c_custkey + 10000000, 'NEWSEGMENT' FROM customer WHERE c_custkey % 97 = 0),
    dima AS (
      SELECT custkey, segment, TIMESTAMP '{T1P}' AS vf,
             CAST(NULL AS TIMESTAMP) AS vt
      FROM b1),
    changed AS (
      SELECT b2.custkey, b2.segment AS new_seg, b1.segment AS old_seg
      FROM b2 JOIN b1 USING (custkey) WHERE b1.segment <> b2.segment),
    new_keys AS (
      SELECT custkey, segment FROM b2
      WHERE custkey NOT IN (SELECT custkey FROM b1)),
    dimb AS (
      SELECT custkey, old_seg AS segment, TIMESTAMP '{T1P}' AS vf,
             TIMESTAMP '{T2P}' AS vt
      FROM changed
      UNION ALL
      SELECT custkey, new_seg, TIMESTAMP '{T2P}', CAST(NULL AS TIMESTAMP) FROM changed
      UNION ALL
      SELECT b1.custkey, b1.segment, TIMESTAMP '{T1P}', CAST(NULL AS TIMESTAMP)
      FROM b1 WHERE b1.custkey NOT IN (SELECT custkey FROM changed)
      UNION ALL
      SELECT custkey, segment, TIMESTAMP '{T2P}', CAST(NULL AS TIMESTAMP) FROM new_keys),
    fa AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, d.segment AS old_segment
      FROM orders o LEFT JOIN dima d
        ON o.o_custkey = d.custkey AND o.o_orderdate >= d.vf
       AND (d.vt IS NULL OR o.o_orderdate < d.vt)),
    fb AS (
      SELECT o.o_orderkey, d.segment AS new_segment
      FROM orders o LEFT JOIN dimb d
        ON o.o_custkey = d.custkey AND o.o_orderdate >= d.vf
       AND (d.vt IS NULL OR o.o_orderdate < d.vt)),
    r AS (
      SELECT fa.o_custkey, fa.o_totalprice, fa.old_segment, fb.new_segment,
             CASE WHEN fa.old_segment IS NULL THEN 'late_dim_arrival'
                  WHEN fb.new_segment IS NULL THEN 'dim_version_lost'
                  ELSE 'retro_correction' END AS change_type
      FROM fa JOIN fb ON fa.o_orderkey = fb.o_orderkey
      WHERE fa.old_segment IS DISTINCT FROM fb.new_segment)
    SELECT change_type, old_segment, new_segment,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
    FROM r GROUP BY 1, 2, 3
    ORDER BY change_type, old_segment NULLS FIRST, new_segment NULLS FIRST
"""


@query(
    "late_dim_reconciliation",
    oracle=_RECON_ORACLE,
    doc="Late-arriving-dimension reconciliation (operators/scd2.py::"
    "scd2_reconcile): dim state A lacks 20% of customer keys (late rows) "
    "and state B retro-corrects segments effective T2P; every order is "
    "point-in-time-resolved against both states (key equi-joins carry "
    "the shuffles, date ranges are post-join filters) and orders whose "
    "event-time version changed are tagged late_dim_arrival / "
    "retro_correction / dim_version_lost and rolled up by old/new "
    "segment. The reconciliation a warehouse runs after a late dim load "
    "to know which facts must be restated.",
)
def late_dim_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_reconcile

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    b1 = c.filter(F.col("c_custkey") % 5 != 0).select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )
    b2 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_custkey") % 7 == 0, "MACHINERY")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
    ).unionByName(
        c.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("custkey"),
            F.lit("NEWSEGMENT").alias("segment"),
        )
    )
    dim_a = scd2_init(b1, T1P)
    dim_b = scd2_merge(dim_a, b2, ["custkey"], ["segment"], T2P)
    recon = scd2_reconcile(
        o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        dim_a,
        dim_b,
        "o_custkey",
        "o_orderdate",
        "custkey",
        ["segment"],
    )
    return (
        recon.groupBy("change_type", "old_segment", "new_segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_totalprice"),
        )
        .orderBy("change_type", "old_segment", "new_segment")
    )


# ---------------------------------------------------------------------------
# Late-arriving FACT revision into the incremental MV — the dual of
# late_dim_reconciliation. mv_incremental_monthly_revenue merges
# forward-only deltas; here facts REVISE closed months: late rows arrive
# for months the base partial already covered, and previously-loaded rows
# are restated (price correction) via retraction+insertion delta rows.
# Because every MV cell is algebraic (COUNT, exact-DECIMAL SUM), the
# revision delta is just more rows in the same cell-wise SUM merge — a
# retraction is a row with cnt=-1, rev=-old_value. No base rescan, no
# special casing: out-of-order data costs one extra delta partial.
# ---------------------------------------------------------------------------

_MVR_ORACLE = f"""
    WITH rev AS (
      SELECT o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 17 = 0 AND o_orderkey % 13 <> 0
                       AND o_orderdate < TIMESTAMP '{_MV_CUTOFF}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) + 100.00
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price,
             CASE WHEN o_orderkey % 13 = 0
                       AND o_orderdate < TIMESTAMP '{_MV_CUTOFF}'
                  THEN 1 ELSE 0 END AS is_late,
             CASE WHEN o_orderkey % 17 = 0 AND o_orderkey % 13 <> 0
                       AND o_orderdate < TIMESTAMP '{_MV_CUTOFF}'
                  THEN 1 ELSE 0 END AS is_revised
      FROM orders)
    SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS order_cnt,
           CAST(SUM(price) AS DOUBLE) AS revenue,
           CAST(SUM(is_late) AS BIGINT) AS n_late_facts,
           CAST(SUM(is_revised) AS BIGINT) AS n_revised
    FROM rev
    GROUP BY 1
    ORDER BY month
"""


@query(
    "late_fact_mv_revision",
    oracle=_MVR_ORACLE,
    doc=f"Out-of-order MV maintenance: the monthly-revenue MV's base "
    f"partial misses late facts (orderkey %% 13, closed months) and "
    f"holds stale prices for restated orders (orderkey %% 17); the "
    f"late-arrival delta adds the missing rows and the revision delta "
    f"restates prices as RETRACTION (cnt=-1, rev=-old) plus INSERTION "
    f"(cnt=+1, rev=new) rows in the same mergeable cells — closed "
    f"months are corrected by cell-wise SUM without rescanning the "
    f"base. The oracle recomputes the MV from the fully-corrected fact "
    f"table, certifying merge-with-revisions == recompute; the "
    f"n_late_facts / n_revised columns pin that closed months really "
    f"absorbed out-of-order rows. Exact-DECIMAL cells make retraction "
    f"cancellation exact on both engines.",
)
def late_fact_mv_revision(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")
    month = F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
        "month"
    )
    price = F.col("o_totalprice").cast("decimal(18,2)")
    is_closed = F.col("o_orderdate") < cutoff
    is_late = (F.col("o_orderkey") % 13 == 0) & is_closed
    is_revised = (
        (F.col("o_orderkey") % 17 == 0) & (F.col("o_orderkey") % 13 != 0) & is_closed
    )

    def partial(df: DataFrame, cnt, rev, late, revised) -> DataFrame:
        return df.groupBy(month).agg(
            F.sum(cnt).cast("bigint").alias("cnt"),
            F.sum(rev).cast("decimal(30,2)").alias("rev"),
            F.sum(late).cast("bigint").alias("late"),
            F.sum(revised).cast("bigint").alias("revised"),
        )

    zero = F.lit(0)
    one = F.lit(1)
    base = partial(o.filter(is_closed & ~is_late), one, price, zero, zero)
    fwd = partial(o.filter(~is_closed), one, price, zero, zero)
    late_delta = partial(o.filter(is_late), one, price, one, zero)
    restated = o.filter(is_revised)
    retract = partial(restated, F.lit(-1), -price, zero, zero)
    insert = partial(
        restated, one, price + F.lit(100).cast("decimal(18,2)"), zero, one
    )
    return (
        base.unionByName(fwd)
        .unionByName(late_delta)
        .unionByName(retract)
        .unionByName(insert)
        .groupBy("month")
        .agg(
            F.sum("cnt").cast("bigint").alias("order_cnt"),
            F.sum("rev").cast("double").alias("revenue"),
            F.sum("late").cast("bigint").alias("n_late_facts"),
            F.sum("revised").cast("bigint").alias("n_revised"),
        )
        .orderBy("month")
    )

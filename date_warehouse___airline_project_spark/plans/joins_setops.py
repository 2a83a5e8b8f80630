"""Join-type and set-operation completeness battery: FULL OUTER join,
EXCEPT ALL / INTERSECT ALL multiset semantics, null-safe equality join,
positional explode (ordinality), and the first/last/nth_value window frame.

These round out SURVEY §2.3/§2.7 beyond the semi/anti/equi/broadcast joins
and UNION/INTERSECT/EXCEPT (distinct) forms already registered. The
reference never needs them (pandas merges are inner/left only —
backend/etl_scripts/cleaning.py), but an engine a reference user switches
to must have the full relational join/set surface.
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
# FULL OUTER join — both sides pre-aggregated to per-(nation, bucket)
# summaries with different thresholds so each side has rows the other
# lacks; the join must preserve both unmatched sets.
# ---------------------------------------------------------------------------
@query(
    "full_outer_nation_balance_buckets",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nationkey,
               CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 2000) AS BIGINT) AS bucket,
               COUNT(*) AS n_customers
        FROM customer WHERE CAST(c_acctbal AS DOUBLE) >= 0
        GROUP BY c_nationkey, CAST(FLOOR(CAST(c_acctbal AS DOUBLE) / 2000) AS BIGINT)
    ),
    s AS (
        SELECT s_nationkey AS nationkey,
               CAST(FLOOR(CAST(s_acctbal AS DOUBLE) / 2000) AS BIGINT) AS bucket,
               COUNT(*) AS n_suppliers
        FROM supplier WHERE CAST(s_acctbal AS DOUBLE) >= 0
        GROUP BY s_nationkey, CAST(FLOOR(CAST(s_acctbal AS DOUBLE) / 2000) AS BIGINT)
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.bucket, s.bucket) AS bucket,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s
      ON c.nationkey = s.nationkey AND c.bucket = s.bucket
    ORDER BY nationkey, bucket
    """,
    doc="FULL OUTER join of two per-(nation, acctbal-bucket) aggregates — "
    "unmatched rows on BOTH sides survive with 0-filled measures.",
)
def full_outer_nation_balance_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    def buckets(df: DataFrame, nk: str, bal: str, out: str) -> DataFrame:
        return (
            df.filter(F.col(bal).cast("double") >= 0)
            .groupBy(
                F.col(nk).alias("nationkey"),
                F.floor(F.col(bal).cast("double") / 2000).cast("bigint").alias("bucket"),
            )
            .agg(F.count("*").alias(out))
        )

    c = buckets(_t(spark, sf_dir, "customer"), "c_nationkey", "c_acctbal", "n_customers")
    s = buckets(_t(spark, sf_dir, "supplier"), "s_nationkey", "s_acctbal", "n_suppliers")
    return (
        c.join(s, on=["nationkey", "bucket"], how="full_outer")
        .select(
            "nationkey",
            "bucket",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey", "bucket")
    )


# ---------------------------------------------------------------------------
# EXCEPT ALL / INTERSECT ALL — multiset semantics (bag difference keeps
# surplus multiplicity; bag intersection keeps the min). Grouped afterwards
# so the result is small and deterministic.
# ---------------------------------------------------------------------------
@query(
    "except_all_priority_bag",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS surplus
    FROM (
        SELECT o_orderpriority FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'AUTOMOBILE'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXCEPT ALL (bag difference): BUILDING-segment order priorities "
    "minus AUTOMOBILE's, multiplicity-aware, then grouped.",
)
def except_all_priority_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def side(seg: str) -> DataFrame:
        return (
            o.join(F.broadcast(c.filter(F.col("c_mktsegment") == seg)), o.o_custkey == c.c_custkey)
            .select("o_orderpriority")
        )

    return (
        side("BUILDING")
        .exceptAll(side("AUTOMOBILE"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("surplus"))
        .orderBy("o_orderpriority")
    )


@query(
    "intersect_all_priority_bag",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS common
    FROM (
        SELECT o_orderpriority FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'AUTOMOBILE'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="INTERSECT ALL (bag intersection): per-priority min multiplicity "
    "across the two segments.",
)
def intersect_all_priority_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def side(seg: str) -> DataFrame:
        return (
            o.join(F.broadcast(c.filter(F.col("c_mktsegment") == seg)), o.o_custkey == c.c_custkey)
            .select("o_orderpriority")
        )

    return (
        side("BUILDING")
        .intersectAll(side("AUTOMOBILE"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("common"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys match
# NULL keys instead of dropping out.
# ---------------------------------------------------------------------------
@query(
    "null_safe_segment_join",
    oracle="""
    WITH cust AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg, c_custkey FROM customer
    ),
    dim AS (
        SELECT NULLIF(seg, 'BUILDING') AS seg, label FROM (
            SELECT 'AUTOMOBILE' AS seg, 'auto' AS label UNION ALL
            SELECT 'BUILDING', 'bld' UNION ALL
            SELECT 'FURNITURE', 'furn' UNION ALL
            SELECT 'HOUSEHOLD', 'house' UNION ALL
            SELECT 'MACHINERY', 'mach'
        )
    )
    SELECT COALESCE(cust.seg, 'NULL') AS seg, dim.label, COUNT(*) AS n
    FROM cust JOIN dim ON cust.seg IS NOT DISTINCT FROM dim.seg
    GROUP BY cust.seg, dim.label
    ORDER BY seg
    """,
    doc="Null-safe equality join: NULLIF-derived NULL keys on both sides "
    "still pair up under <=> (IS NOT DISTINCT FROM).",
)
def null_safe_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"), "c_custkey"
    )
    dim = (
        cust.sparkSession.createDataFrame(
            [
                ("AUTOMOBILE", "auto"),
                ("BUILDING", "bld"),
                ("FURNITURE", "furn"),
                ("HOUSEHOLD", "house"),
                ("MACHINERY", "mach"),
            ],
            "seg string, label string",
        )
        .select(F.nullif(F.col("seg"), F.lit("BUILDING")).alias("seg"), "label")
    )
    return (
        cust.join(F.broadcast(dim), cust.seg.eqNullSafe(dim.seg))
        .groupBy(F.coalesce(cust.seg, F.lit("NULL")).alias("seg"), dim.label)
        .agg(F.count("*").alias("n"))
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Positional explode (ordinality) — token positions per document. DuckDB's
# parallel UNNEST of the token list and a generated index list is the
# ordinality oracle; Spark's posexplode is 0-based, so +1.
# ---------------------------------------------------------------------------
@query(
    "posexplode_doc_token_positions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS tl FROM documents
    )
    SELECT doc_id, pos, term
    FROM (
        SELECT doc_id,
               UNNEST(RANGE(1, LENGTH(tl) + 1)) AS pos,
               UNNEST(tl) AS term
        FROM toks
    )
    WHERE pos <= 3 AND term <> ''
    ORDER BY doc_id, pos
    LIMIT 300
    """,
    doc="Positional explode (WITH ORDINALITY): first-3 token positions per "
    "document; DuckDB parallel-UNNESTs the list and its index range.",
)
def posexplode_doc_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "term"),
        )
        .filter((F.col("pos0") < 3) & (F.col("term") != ""))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
        .orderBy("doc_id", "pos")
        .limit(300)
    )


# ---------------------------------------------------------------------------
# first/last/nth_value over a full-partition frame — one row per customer.
# Deterministic order key (orderdate, orderkey); the frame must be
# UNBOUNDED..UNBOUNDED for last/nth to see the whole partition.
# ---------------------------------------------------------------------------
@query(
    "first_last_nth_order_values",
    oracle="""
    SELECT DISTINCT o_custkey,
           CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(CAST(o_totalprice AS DECIMAL(18,2)), 2) OVER w AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    LIMIT 500
    """,
    doc="first_value/last_value/nth_value(2) over the full-partition ROWS "
    "frame, deduplicated to one row per customer.",
)
def first_last_nth_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    price = F.col("o_totalprice").cast(DEC)
    return (
        o.select(
            "o_custkey",
            F.first(price).over(w).cast("double").alias("first_price"),
            F.last(price).over(w).cast("double").alias("last_price"),
            F.nth_value(price, 2).over(w).cast("double").alias("second_price"),
        )
        .distinct()
        .orderBy("o_custkey")
        .limit(500)
    )


@query(
    "union_by_name_mismatched",
    oracle="""
    SELECT o_orderkey AS key, o_totalprice AS amount, NULL AS segment,
           'order' AS src
    FROM orders WHERE o_orderkey % 211 = 0
    UNION ALL
    SELECT c_custkey AS key, NULL AS amount, c_mktsegment AS segment,
           'customer' AS src
    FROM customer WHERE c_custkey % 73 = 0
    ORDER BY src, key
    """,
    doc="unionByName(allowMissingColumns=True): schema-mismatched frames "
    "aligned by column NAME with absent columns null-filled - the "
    "engine-native form of the reference's add-missing-columns-with-"
    "defaults habit (cleaning.py:325-336). Oracle spells the alignment "
    "out as UNION ALL with explicit NULLs.",
)
def union_by_name_mismatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 211 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("amount"),
            F.lit("order").alias("src"),
        )
    )
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 73 == 0)
        .select(
            F.col("c_custkey").alias("key"),
            F.col("c_mktsegment").alias("segment"),
            F.lit("customer").alias("src"),
        )
    )
    return (
        o.unionByName(c, allowMissingColumns=True)
        .select("key", "amount", "segment", "src")
        .orderBy("src", "key")
    )


# ---------------------------------------------------------------------------
# Spatial radius join via grid bucketing (the LSH of geometry)
# ---------------------------------------------------------------------------

_GRID_R = 50       # radius; cell edge == R makes the 3x3 neighborhood exact
_GRID_PLANE = 1000  # synthetic plane edge

_GRID_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey,
             (c_custkey * 7) % {_GRID_PLANE} AS xc,
             (c_custkey * 13) % {_GRID_PLANE} AS yc
      FROM customer),
    s AS (
      SELECT s_suppkey,
             (s_suppkey * 11) % {_GRID_PLANE} AS xs,
             (s_suppkey * 17) % {_GRID_PLANE} AS ys
      FROM supplier),
    sn AS (
      SELECT s.*, s.xs // {_GRID_R} + dx.d AS gx, s.ys // {_GRID_R} + dy.d AS gy
      FROM s,
           (SELECT UNNEST([-1, 0, 1]) AS d) dx,
           (SELECT UNNEST([-1, 0, 1]) AS d) dy)
    SELECT c.c_custkey, n.s_suppkey,
           (c.xc - n.xs) * (c.xc - n.xs) + (c.yc - n.ys) * (c.yc - n.ys) AS dist_sq
    FROM c JOIN sn n
      ON c.xc // {_GRID_R} = n.gx AND c.yc // {_GRID_R} = n.gy
    WHERE (c.xc - n.xs) * (c.xc - n.xs) + (c.yc - n.ys) * (c.yc - n.ys)
          <= {_GRID_R * _GRID_R}
    ORDER BY c_custkey, s_suppkey
"""


@query(
    "spatial_radius_gridjoin",
    oracle=_GRID_ORACLE,
    doc=f"Spatial radius join via grid bucketing — the geometric analogue "
    f"of LSH blocking: points land in cells of edge R={_GRID_R}, the "
    f"SMALLER side is replicated to its 3x3 cell neighborhood, and the "
    f"join is an EQUI-join on the cell key — exact by construction "
    f"(cell edge >= R means any pair within R shares one of the 9 "
    f"cells) with squared-distance verification in pure integer math "
    f"(no float rounding to diverge between engines). Cost is "
    f"Sigma per-cell |c|x|s| over NEIGHBORING cells, never |C|x|S|; at "
    f"100 TB both sides shuffle once on the cell key and density skew "
    f"is AQE-splittable. Coordinates are synthetic (hash-derived plane "
    f"positions) — the pattern, not the geodesy, is the operator.",
)
def spatial_radius_gridjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7) % _GRID_PLANE).alias("xc"),
        ((F.col("c_custkey") * 13) % _GRID_PLANE).alias("yc"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 11) % _GRID_PLANE).alias("xs"),
        ((F.col("s_suppkey") * 17) % _GRID_PLANE).alias("ys"),
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    sn = (
        supp.withColumn("dx", d)
        .withColumn("dy", d)
        .select(
            "s_suppkey",
            "xs",
            "ys",
            (F.floor(F.col("xs") / _GRID_R) + F.col("dx")).alias("gx"),
            (F.floor(F.col("ys") / _GRID_R) + F.col("dy")).alias("gy"),
        )
    )
    dist_sq = (F.col("xc") - F.col("xs")) * (F.col("xc") - F.col("xs")) + (
        F.col("yc") - F.col("ys")
    ) * (F.col("yc") - F.col("ys"))
    gridded = cust.withColumn("gx", F.floor(F.col("xc") / _GRID_R)).withColumn(
        "gy", F.floor(F.col("yc") / _GRID_R)
    )
    return (
        gridded.join(sn, ["gx", "gy"])
        .filter(dist_sq <= _GRID_R * _GRID_R)
        .select("c_custkey", "s_suppkey", dist_sq.alias("dist_sq"))
        .orderBy("c_custkey", "s_suppkey")
    )

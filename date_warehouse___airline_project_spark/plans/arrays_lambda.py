"""Array / higher-order-function surface: lambda expressions over array
columns (transform / filter / aggregate / exists / forall / zip_with),
UNPIVOT wide-to-long reshaping, a second string-function battery
(split_part / lpad / translate / levenshtein), and bitwise aggregates.

The reference has no array types at all (SURVEY §1.2: "No arrays, maps,
intervals, or nested structs"), but a Spark-native engine exposes the
full lambda surface — it is the scale path for anything per-row
variable-length (token lists, embedding maths, multi-value attributes)
without leaving the JVM. All arrays here are built from integers so the
lambda arithmetic is bit-exact across engines; DuckDB's list_* lambda
functions are the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "higher_order_array_battery",
    oracle="""
    WITH arr AS (
        SELECT l_orderkey, LIST_SORT(LIST(l_linenumber)) AS lns
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           LEN(lns) AS n_lines,
           CAST(LIST_AGGREGATE(lns, 'sum') AS BIGINT) AS line_sum,
           CAST(COALESCE(LIST_AGGREGATE(LIST_FILTER(lns, x -> x % 2 = 0), 'sum'), 0) AS BIGINT) AS even_sum,
           CAST(LIST_MAX(LIST_TRANSFORM(lns, x -> x * 10 + 1)) AS BIGINT) AS max_affine,
           LEN(LIST_FILTER(lns, x -> x > 4)) > 0 AS any_gt4,
           LEN(LIST_FILTER(lns, x -> NOT (x > 0))) = 0 AS all_positive,
           CAST(LIST_DOT_PRODUCT(lns, LIST_REVERSE(lns)) AS BIGINT) AS rev_dot
    FROM arr
    WHERE l_orderkey % 7 = 0
    ORDER BY l_orderkey
    """,
    doc="Lambda surface over int arrays (collect_list-sorted linenumbers "
    "per order): aggregate-sum, filter+aggregate, transform+array_max, "
    "exists, forall, zip_with-reverse dot product. Integer arithmetic "
    "throughout for cross-engine bit-exactness.",
)
def higher_order_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("lns"))
        .filter(F.col("l_orderkey") % 7 == 0)
    )
    lns = F.col("lns")
    zero = F.lit(0).cast("long")
    return arr.select(
        "l_orderkey",
        F.size(lns).alias("n_lines"),
        F.aggregate(lns, zero, lambda acc, x: acc + x).alias("line_sum"),
        F.aggregate(F.filter(lns, lambda x: x % 2 == 0), zero, lambda acc, x: acc + x).alias(
            "even_sum"
        ),
        F.array_max(F.transform(lns, lambda x: (x * 10 + 1).cast("long"))).alias("max_affine"),
        F.exists(lns, lambda x: x > 4).alias("any_gt4"),
        F.forall(lns, lambda x: x > 0).alias("all_positive"),
        F.aggregate(
            F.zip_with(lns, F.reverse(lns), lambda a, b: (a * b).cast("long")),
            zero,
            lambda acc, x: acc + x,
        ).alias("rev_dot"),
    ).orderBy("l_orderkey")


@query(
    "unpivot_status_metrics",
    oracle="""
    WITH wide AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, metric, value FROM wide
    UNPIVOT (value FOR metric IN (n_orders, total_revenue, max_price))
    ORDER BY o_orderstatus, metric
    """,
    doc="UNPIVOT wide-to-long reshape (Spark df.unpivot / melt) of a "
    "per-status aggregate: 3 measure columns become (metric, value) rows. "
    "Measures computed in DECIMAL then cast double at the edge.",
)
def unpivot_status_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    wide = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(dec).cast("double").alias("total_revenue"),
        F.max(dec).cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_revenue", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("o_orderstatus", "metric")


@query(
    "string_battery2",
    oracle="""
    SELECT p_partkey,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           SPLIT_PART(p_name, ' ', -1) AS last_word,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           RPAD(p_brand, 12, '.') AS padded_brand,
           TRANSLATE(p_type, 'AEIOU', 'aeiou') AS lowered_vowels,
           LEVENSHTEIN(SPLIT_PART(p_name, ' ', 1), SPLIT_PART(p_name, ' ', -1)) AS name_edit_dist,
           REVERSE(p_brand) AS rev_brand,
           STRPOS(p_type, 'BRUSHED') AS brushed_pos,
           REPEAT(p_brand, 2) AS double_brand
    FROM part
    WHERE p_partkey % 5 = 0
    ORDER BY p_partkey
    """,
    doc="Second string battery: split_part (positive and negative index), "
    "lpad/rpad, translate, levenshtein edit distance, reverse, "
    "instr/strpos, repeat — completing §2.8 beyond the reference's "
    "trim/case/regex set.",
)
def string_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    first = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    last = F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1))
    return (
        p.filter(F.col("p_partkey") % 5 == 0)
        .select(
            "p_partkey",
            first.alias("first_word"),
            last.alias("last_word"),
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
            F.rpad("p_brand", 12, ".").alias("padded_brand"),
            F.translate("p_type", "AEIOU", "aeiou").alias("lowered_vowels"),
            F.levenshtein(first, last).alias("name_edit_dist"),
            F.reverse("p_brand").alias("rev_brand"),
            F.instr("p_type", "BRUSHED").alias("brushed_pos"),
            F.repeat("p_brand", 2).alias("double_brand"),
        )
        .orderBy("p_partkey")
    )


@query(
    "bitwise_agg_battery",
    oracle="""
    SELECT c_mktsegment,
           BIT_AND(c_custkey) AS key_and,
           BIT_OR(c_custkey) AS key_or,
           BIT_XOR(c_custkey) AS key_xor,
           BIT_AND(c_custkey & 255) AS low_byte_and,
           BIT_XOR(c_custkey << 1) AS shifted_xor
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Bitwise aggregate surface: bit_and/bit_or/bit_xor per group, "
    "composed with scalar &, << — all-integer, bit-exact.",
)
def bitwise_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.bit_and(k).alias("key_and"),
            F.bit_or(k).alias("key_or"),
            F.bit_xor(k).alias("key_xor"),
            F.bit_and(k.bitwiseAND(F.lit(255))).alias("low_byte_and"),
            F.bit_xor(F.shiftleft(k, 1)).alias("shifted_xor"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "explode_outer_empty_arrays",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, LIST_SORT(LIST(l_linenumber) FILTER (l_quantity > 45))
                   AS big_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT b.l_orderkey, u.ln AS linenumber
    FROM big b LEFT JOIN
         (SELECT l_orderkey, UNNEST(big_lines) AS ln FROM big) u
      ON b.l_orderkey = u.l_orderkey
    WHERE b.l_orderkey % 19 = 0
    ORDER BY b.l_orderkey, linenumber
    """,
    doc="explode_outer: null-preserving UNNEST - orders whose "
    "high-quantity line array is EMPTY survive as a null row instead of "
    "vanishing (plain explode drops them). The oracle builds the same "
    "semantics with LEFT JOIN against the unnested rows.",
)
def explode_outer_empty_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("l_quantity") > 45, F.col("l_linenumber")))
            ).alias("big_lines")
        )
        .filter(F.col("l_orderkey") % 19 == 0)
    )
    return big.select(
        "l_orderkey", F.explode_outer("big_lines").alias("linenumber")
    ).orderBy("l_orderkey", "linenumber")

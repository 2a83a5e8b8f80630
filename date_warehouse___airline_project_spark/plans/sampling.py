"""Deterministic sampling and skew-aware aggregation — training-data
pipeline operations (dataset curation needs reproducible samples; skewed
group keys need two-phase aggregation).

Sampling uses md5-hash gates instead of RNG: ``hash(id) % K == 0`` picks a
uniform, seedless, engine-portable fraction — the same rows on every run,
every engine, every partitioning. This is how large corpus pipelines
sample (rerunnable, auditable), and it lets the DuckDB oracle replicate
the exact sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


from ..functions.hashing import hash56


def _hash_gate(col, mod: int):
    return hash56(col) % mod == 0


_HASH_SQL = "CAST(CONCAT('0x', SUBSTR(MD5(CAST({c} AS VARCHAR)), 1, 14)) AS BIGINT)"


@query(
    "deterministic_sample_orders",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE {_HASH_SQL.format(c='o_orderkey')} % 20 = 0
    ORDER BY o_orderkey
    """,
    doc="Deterministic ~5% sample via an md5-hash gate on the key — "
    "seedless, reproducible, partitioning-independent; the scan-side "
    "filter costs one hash per row and no shuffle.",
)
def deterministic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(_hash_gate(F.col("o_orderkey"), 20))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {_HASH_SQL.format(c='doc_id')}, doc_id) AS rn
      FROM documents)
    WHERE rn <= 5
    ORDER BY lang, doc_id
    """,
    doc="Stratified sample: exactly 5 docs per language, chosen by hash "
    "order (uniform within stratum, deterministic). One shuffle on the "
    "stratum key; per-stratum top-N never sorts globally.",
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    h = hash56(F.col("doc_id"))
    w = W.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


@query(
    "distinct_users_two_phase",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="COUNT(DISTINCT) over a 5-value (heavily skewed) group key, "
    "planned explicitly as the two-phase expansion: dedup on (key, user) "
    "— where partial aggregation absorbs duplicates map-side and the "
    "shuffle spreads over the COMPOSITE key's full cardinality — then a "
    "tiny exact count per key. Never funnels all rows of one hot key "
    "through a single reducer, the classic skew fix at 100 TB.",
)
def distinct_users_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # phase 1: per (event_type, user_id) partial counts — shuffle key has
    # |types| × |users| cardinality, so no hot partition
    per_user = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("_n"))
    # phase 2: tiny aggregate over the deduped relation
    return (
        per_user.groupBy("event_type")
        .agg(F.count("*").alias("n_users"), F.sum("_n").alias("n_events"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (min-of-w-hashes priority draw)
# ---------------------------------------------------------------------------

_WS_K = 100

_WS_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, source,
             GREATEST(CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT), 1)
                 AS weight
      FROM documents),
    draws AS (
      SELECT t.doc_id, t.source, t.weight,
             MIN(CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST(t.doc_id AS VARCHAR),
                 ':', CAST(r.r AS VARCHAR))), 1, 14)) AS BIGINT)) AS draw_key
      FROM t, UNNEST(range(1, 1000)) AS r(r)
      WHERE r.r <= t.weight
      GROUP BY t.doc_id, t.source, t.weight)
    SELECT doc_id, source, weight, draw_key
    FROM draws
    ORDER BY draw_key, doc_id
    LIMIT {_WS_K}
"""


@query(
    "doc_weighted_sample_topk",
    oracle=_WS_ORACLE,
    doc=f"Deterministic weighted sampling — {_WS_K} docs drawn with "
    f"probability increasing in token-count weight, no RNG: each doc "
    f"makes `weight` independent hash draws and keeps the minimum; "
    f"P(doc i outdraws doc j) = w_i/(w_i+w_j) exactly (min of w uniform "
    f"variates), so longer documents win proportionally more often and "
    f"the whole sample replays bit-identically on any engine. Plan: one "
    f"explode bounded by the weight (Sigma w rows), a map-side-combined "
    f"MIN per doc, TakeOrdered k. For large weights the explode factor "
    f"is capped by coarsening weights to blocks (hash once per block) — "
    f"the standard trick; synthetic docs are ~50 tokens so the direct "
    f"form is the honest benchmark.",
)
def doc_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import hash56

    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("bigint"),
            F.lit(1).cast("bigint"),
        ).alias("weight"),
    )
    draws = (
        t.select(
            "doc_id",
            "source",
            "weight",
            # Capped at 999 draws — matches the oracle's
            # UNNEST(range(1, 1000)) ... WHERE r <= weight exactly and
            # bounds the explode factor for heavy docs (the "coarsen large
            # weights" trick the doc promises, realized as a hard cap).
            F.explode(
                F.sequence(
                    F.lit(1).cast("bigint"),
                    F.least(F.col("weight"), F.lit(999).cast("bigint")),
                )
            ).alias("r"),
        )
        .select(
            "doc_id",
            "source",
            "weight",
            hash56(
                F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("r").cast("string"))
            ).alias("h"),
        )
        .groupBy("doc_id", "source", "weight")
        .agg(F.min("h").alias("draw_key"))
    )
    return draws.orderBy("draw_key", "doc_id").limit(_WS_K)

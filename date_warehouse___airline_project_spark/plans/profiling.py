"""Dataset profiling — the first stage of any training-data or warehouse
ingestion pipeline: per-column null rates, distinct cardinalities, and
range statistics in ONE pass over the table.

The single-pass shape matters at 100 TB: every statistic here is a
partial-aggregable expression, so the whole profile is one scan + one
1-row-per-group reduce — never a per-column loop of separate jobs.
(For distincts at extreme cardinality the same plan swaps COUNT(DISTINCT)
for approx_count_distinct — kept exact here for the oracle.)
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
    "profile_orders_columns",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS orderkey_nonnull,
           COUNT(DISTINCT o_custkey) AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           COUNT(DISTINCT o_orderpriority) AS priority_distinct,
           CAST(MIN(o_totalprice) AS DOUBLE) AS price_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS price_max,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS date_min,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS date_max,
           MIN(LENGTH(o_orderpriority)) AS priority_len_min,
           MAX(LENGTH(o_orderpriority)) AS priority_len_max
    FROM orders
    """,
    doc="Single-pass table profile: counts, null counts, distinct "
    "cardinalities, numeric/date/string ranges — one scan, one reduce.",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("orderkey_nonnull"),
        F.count_distinct("o_custkey").alias("custkey_distinct"),
        F.count_distinct("o_orderstatus").alias("status_distinct"),
        F.count_distinct("o_orderpriority").alias("priority_distinct"),
        F.min("o_totalprice").cast("double").alias("price_min"),
        F.max("o_totalprice").cast("double").alias("price_max"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("price_sum"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("date_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("date_max"),
        F.min(F.length("o_orderpriority")).alias("priority_len_min"),
        F.max(F.length("o_orderpriority")).alias("priority_len_max"),
    )


@query(
    "profile_documents_quality",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(n_chars) AS chars_min,
           MAX(n_chars) AS chars_max,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
           COUNT(CASE WHEN n_chars < 100 THEN 1 END) AS n_short,
           COUNT(CASE WHEN text IS NULL OR TRIM(text) = '' THEN 1 END) AS n_empty
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Per-source corpus profile (doc counts, language spread, length "
    "distribution tails, empty-text rate) — the pre-dedup health check "
    "of a training-data pipeline.",
)
def profile_documents_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.min("n_chars").alias("chars_min"),
            F.max("n_chars").alias("chars_max"),
            F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("chars_total"),
            F.count_if(F.col("n_chars") < 100).alias("n_short"),
            F.count_if(F.col("text").isNull() | (F.trim("text") == "")).alias("n_empty"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Distribution drift between two time windows (PSI)
# ---------------------------------------------------------------------------

_PSI_SPLIT = "1998-01-01"
_PSI_BINW = 50000.0
_PSI_NBINS = 10

_PSI_ORACLE = f"""
    WITH o AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / {_PSI_BINW}) AS BIGINT),
                   {_PSI_NBINS - 1}) AS bin,
             o_orderdate < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
      FROM orders),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
             CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cur_cnt
      FROM o GROUP BY bin),
    spine AS (SELECT UNNEST(range(0, {_PSI_NBINS})) AS bin),
    filled AS (
      SELECT s.bin,
             COALESCE(c.ref_cnt, 0) AS ref_cnt,
             COALESCE(c.cur_cnt, 0) AS cur_cnt
      FROM spine s LEFT JOIN counts c ON c.bin = s.bin),
    tot AS (
      SELECT CAST(SUM(ref_cnt) AS BIGINT) AS rt,
             CAST(SUM(cur_cnt) AS BIGINT) AS ct
      FROM filled),
    terms AS (
      SELECT f.bin, f.ref_cnt, f.cur_cnt,
             GREATEST(CAST(f.ref_cnt AS DOUBLE) / CAST(t.rt AS DOUBLE), 1e-6) AS pr,
             GREATEST(CAST(f.cur_cnt AS DOUBLE) / CAST(t.ct AS DOUBLE), 1e-6) AS pc
      FROM filled f, tot t),
    terms2 AS (
      SELECT bin, ref_cnt, cur_cnt, pr, pc,
             ROUND((pc - pr) * LN(pc / pr), 6) AS term
      FROM terms)
    SELECT bin, ref_cnt, cur_cnt,
           ROUND(pr, 6) AS ref_pct, ROUND(pc, 6) AS cur_pct,
           term AS psi_term
    FROM terms2
    UNION ALL
    SELECT CAST(-1 AS BIGINT), (SELECT rt FROM tot), (SELECT ct FROM tot),
           1.0, 1.0,
           CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE)
    FROM terms2
    ORDER BY bin
"""


@query(
    "profile_drift_psi",
    oracle=_PSI_ORACLE,
    doc=f"Distribution DRIFT between two time windows — the population "
    f"stability index over o_totalprice in {_PSI_NBINS} fixed-width bins, "
    f"reference = orders before {_PSI_SPLIT}, current = after. This is "
    f"the monitoring query an ML pipeline runs between snapshots before "
    f"trusting a retrain: one scan tags window+bin, one {_PSI_NBINS}-row "
    f"aggregate, proportions clamped at 1e-6 for empty bins (fixed bin "
    f"edges keep the sketch mergeable and engine-deterministic — no "
    f"quantile estimation in the hot path). Per-bin PSI terms are "
    f"rounded to 6 then totalled as exact DECIMAL(18,6) so the summary "
    f"row (bin = -1) is independent of partition/accumulation order on "
    f"both engines.",
)
def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = F.least(
        F.floor(F.col("o_totalprice") / _PSI_BINW).cast("bigint"),
        F.lit(_PSI_NBINS - 1).cast("bigint"),
    )
    tagged = o.select(
        b.alias("bin"),
        (F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("is_ref"),
    )
    counts = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("ref_cnt"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).cast("bigint").alias("cur_cnt"),
    )
    return psi_report_from_counts(o.sparkSession, counts)


def psi_report_from_counts(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """PSI terms + summary row from a (bin, ref_cnt, cur_cnt) relation.

    Shared verbatim by the batch registry query above and the streaming
    drift monitor (``streaming/drift_stream.py::psi_report``), so the
    stream-equals-batch test pins one implementation, not two copies.
    Missing bins are spine-filled to zero before the proportion clamp.
    """
    spine = spark.range(_PSI_NBINS).select(F.col("id").cast("bigint").alias("bin"))
    filled = spine.join(F.broadcast(counts), "bin", "left").select(
        "bin",
        F.coalesce("ref_cnt", F.lit(0)).cast("bigint").alias("ref_cnt"),
        F.coalesce("cur_cnt", F.lit(0)).cast("bigint").alias("cur_cnt"),
    )
    totals = filled.agg(
        F.sum("ref_cnt").cast("bigint").alias("rt"),
        F.sum("cur_cnt").cast("bigint").alias("ct"),
    )
    j = filled.crossJoin(F.broadcast(totals))
    pr = F.greatest(
        F.col("ref_cnt").cast("double") / F.col("rt").cast("double"), F.lit(1e-6)
    )
    pc = F.greatest(
        F.col("cur_cnt").cast("double") / F.col("ct").cast("double"), F.lit(1e-6)
    )
    term = F.round((pc - pr) * F.log(pc / pr), 6)
    terms = j.select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.round(pr, 6).alias("ref_pct"),
        F.round(pc, 6).alias("cur_pct"),
        term.alias("psi_term"),
        "rt",
        "ct",
    )
    total_row = terms.agg(
        F.lit(-1).cast("bigint").alias("bin"),
        F.max("rt").cast("bigint").alias("ref_cnt"),
        F.max("ct").cast("bigint").alias("cur_cnt"),
        F.lit(1.0).alias("ref_pct"),
        F.lit(1.0).alias("cur_pct"),
        F.sum(F.col("psi_term").cast("decimal(18,6)")).cast("double").alias("psi_term"),
    )
    return (
        terms.drop("rt", "ct").unionByName(total_row).orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Shannon entropy per categorical column (one unpivoted scan)
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
    WITH unpivoted AS (
      SELECT 'o_orderstatus' AS column_name, o_orderstatus AS value FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'order_year', CAST(EXTRACT(YEAR FROM o_orderdate) AS VARCHAR)
      FROM orders),
    c AS (
      SELECT column_name, value, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM unpivoted GROUP BY 1, 2),
    t AS (
      SELECT column_name, CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM c GROUP BY 1)
    SELECT c.column_name, t.n_distinct,
           CAST(SUM(CAST(ROUND(
             -(CAST(c.cnt AS DOUBLE) / t.total)
               * LOG2(CAST(c.cnt AS DOUBLE) / t.total), 8)
             AS DECIMAL(20,8))) AS DOUBLE) AS entropy_bits,
           ROUND(MAX(CAST(c.cnt AS DOUBLE) / t.total), 6) AS top_value_pct
    FROM c JOIN t ON t.column_name = c.column_name
    GROUP BY c.column_name, t.n_distinct
    ORDER BY c.column_name
"""


@query(
    "column_entropy_profile",
    oracle=_ENTROPY_ORACLE,
    doc="Shannon entropy (bits) + distinct count + modal share per "
    "categorical column, via ONE unpivoted scan (stack) and two "
    "grouped aggregates — the information-content profile a feature "
    "store runs before encoding decisions. Per-value terms round "
    "then DECIMAL-sum, so the entropy is accumulation-order "
    "independent; cardinality stays bounded by the value domain, not "
    "the row count.",
)
def column_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    unpivoted = o.select(
        F.expr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'order_year', CAST(EXTRACT(YEAR FROM o_orderdate) AS STRING)"
            ") AS (column_name, value)"
        )
    )
    c = unpivoted.groupBy("column_name", "value").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    t = c.groupBy("column_name").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_distinct"),
    )
    p = F.col("cnt").cast("double") / F.col("total")
    term = F.round(-p * F.log2(p), 8).cast("decimal(20,8)")
    return (
        c.join(F.broadcast(t), "column_name")
        .groupBy("column_name", "n_distinct")
        .agg(
            F.sum(term).cast("double").alias("entropy_bits"),
            F.round(F.max(p), 6).alias("top_value_pct"),
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# binned two-sample Kolmogorov-Smirnov test
# ---------------------------------------------------------------------------

_KS_BINW = 10000.0
_KS_NBINS = 50
_KS_CRIT = 1.358  # c(alpha) at alpha = 0.05


_KS_ORACLE = f"""
    WITH o AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / {_KS_BINW}) AS BIGINT),
                   {_KS_NBINS - 1}) AS bin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS g
      FROM orders),
    counts AS (
      SELECT bin,
             SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
      FROM o GROUP BY bin),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM counts),
    cum AS (
      SELECT bin,
             SUM(ca) OVER (ORDER BY bin) AS cum_a,
             SUM(cb) OVER (ORDER BY bin) AS cum_b
      FROM counts),
    gaps AS (
      SELECT c.bin,
             ABS(CAST(c.cum_a AS DOUBLE) / t.na
                 - CAST(c.cum_b AS DOUBLE) / t.nb) AS gap
      FROM cum c, tot t)
    SELECT t.na AS n_a, t.nb AS n_b,
           ROUND(MAX(g.gap), 6) AS ks_stat,
           ROUND({_KS_CRIT} * SQRT((t.na + t.nb) / (CAST(t.na AS DOUBLE) * t.nb)),
                 6) AS ks_critical,
           CASE WHEN MAX(g.gap) > {_KS_CRIT}
                     * SQRT((t.na + t.nb) / (CAST(t.na AS DOUBLE) * t.nb))
                THEN 1 ELSE 0 END AS reject_same_dist
    FROM gaps g, tot t
    GROUP BY t.na, t.nb
"""


@query(
    "ks_test_priority_totalprice",
    oracle=_KS_ORACLE,
    doc=f"Binned two-sample Kolmogorov-Smirnov test: does the totalprice "
    f"distribution of URGENT orders differ from the rest? One scan tags "
    f"({_KS_NBINS}-bin, group), a {_KS_NBINS}-row grouped count is the "
    f"complete sufficient state (mergeable cell-wise, the same shape as "
    f"the PSI monitor above), then cumulative CDFs and the max gap vs "
    f"the alpha=0.05 critical value run over the bin relation only — "
    f"corpus-scale work is one aggregate regardless of volume.",
)
def ks_test_priority_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / _KS_BINW).cast("bigint"),
            F.lit(_KS_NBINS - 1),
        ).alias("bin"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "a").otherwise("b").alias("g"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("g") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == "b", 1).otherwise(0)).alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    from pyspark.sql import Window as W

    # cumulative CDF over the <=50-row bin relation (bounded global window,
    # same allowlisted shape as quantile_sketch_totalprice)
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cum = counts.select(
        "bin", F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("cum_a").cast("double") / F.col("na")
            - F.col("cum_b").cast("double") / F.col("nb")
        ).alias("gap"),
        "na",
        "nb",
    )
    crit = F.lit(_KS_CRIT) * F.sqrt(
        (F.col("na") + F.col("nb")) / (F.col("na").cast("double") * F.col("nb"))
    )
    return (
        gaps.groupBy("na", "nb")
        .agg(F.max("gap").alias("_ks"))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.round(F.col("_ks"), 6).alias("ks_stat"),
            F.round(crit, 6).alias("ks_critical"),
            F.when(F.col("_ks") > crit, 1).otherwise(0).alias("reject_same_dist"),
        )
    )

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


# ---------------------------------------------------------------------------
# One-pass Pearson correlation matrix from mergeable moments.
#
# Every pairwise correlation among k numeric columns needs only the moment
# vector (n, Sx_i, Sx_i^2, Sx_i*x_j) — k(k+3)/2 partial-aggregable sums, ONE
# scan, one 1-row reduce regardless of volume. Pearson r is affine-invariant,
# so each measure is first divided by a fixed POWER OF TWO bound (exact in
# binary — exponent shifts commute with IEEE rounding, so scaled products
# are bit-equivalent to shifted raw products); every term then fits |t| < 1
# and round(t * 1e8) sums as a plain BIGINT — the scaled-long mergeable-
# moment discipline of operators/similarity.py::pca_moment_cells, exact
# under any partitioning and int64-safe to ~1e10 rows (switch the sums to
# DECIMAL past that). The r5-r7 DECIMAL(38,6) formulation computed the same
# shape 3x slower: byte-array-backed decimal sums were the entire query
# cost at sf0.1 (9.2 s vs 2.6 s measured same-session, scan itself 0.26 s).
# Corr is closed-form from the sums. This is how a 100 TB profiler computes
# a correlation matrix: never one job per pair.
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
# fixed power-of-2 upper bounds (TPC-H domains: qty<=50, price<~111k,
# discount<=0.1, tax<=0.08) — division is EXACT on doubles
_CORR_POW2 = {
    "l_quantity": 64.0,
    "l_extendedprice": 131072.0,
    "l_discount": 1.0,
    "l_tax": 1.0,
}
_CORR_SCALE = 1e8


def _corr_pairs() -> list[tuple[str, str]]:
    return [
        (_CORR_COLS[i], _CORR_COLS[j])
        for i in range(len(_CORR_COLS))
        for j in range(i + 1, len(_CORR_COLS))
    ]


def _corr_oracle() -> str:
    sc = {c: f"({c} / {_CORR_POW2[c]!r})" for c in _CORR_COLS}
    sums = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(
            f"SUM(CAST(ROUND({sc[c]} * {_CORR_SCALE!r}, 0) AS BIGINT)) AS s_{c}"
        )
        sums.append(
            f"SUM(CAST(ROUND({sc[c]} * {sc[c]} * {_CORR_SCALE!r}, 0) AS BIGINT))"
            f" AS s2_{c}"
        )
    for a, b in _corr_pairs():
        sums.append(
            f"SUM(CAST(ROUND({sc[a]} * {sc[b]} * {_CORR_SCALE!r}, 0) AS BIGINT))"
            f" AS sp_{a}_{b}"
        )
    arms = []
    # un-scale each moment back to raw units in DOUBLE (s carries K, s2/sp
    # carry K once on squared terms — dividing every sum by K restores a
    # consistent scale; r is invariant to the residual common factor)
    d = {
        name: f"(CAST({name} AS DOUBLE) / {_CORR_SCALE!r})"
        for name in (
            [f"s_{c}" for c in _CORR_COLS]
            + [f"s2_{c}" for c in _CORR_COLS]
            + [f"sp_{a}_{b}" for a, b in _corr_pairs()]
        )
    }
    for a, b in _corr_pairs():
        num = (
            f"(CAST(n AS DOUBLE) * {d[f'sp_{a}_{b}']}"
            f" - {d[f's_{a}']} * {d[f's_{b}']})"
        )
        den = (
            f"SQRT(CAST(n AS DOUBLE) * {d[f's2_{a}']}"
            f" - {d[f's_{a}']} * {d[f's_{a}']})"
            f" * SQRT(CAST(n AS DOUBLE) * {d[f's2_{b}']}"
            f" - {d[f's_{b}']} * {d[f's_{b}']})"
        )
        arms.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, n,"
            f" ROUND({num} / ({den}), 6) AS pearson_r FROM m"
        )
    return "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n" + "\nUNION ALL ".join(arms) + "\nORDER BY col_x, col_y"


@query(
    "corr_matrix_lineitem",
    oracle=_corr_oracle(),
    doc="Pairwise Pearson correlation matrix over 4 lineitem measures from "
    "ONE moment pass: affine-invariant power-of-2 pre-scaling (exact on "
    "doubles) brings every term under 1, so the 14 moments sum as scaled "
    "BIGINTs (round(t*1e8) per term — partition-order invariant, int64-"
    "safe to ~1e10 rows, the pca_moment_cells discipline), then closed-"
    "form corr per pair off the 1-row moment relation. One scan "
    "regardless of pair count — the mergeable-state shape that survives "
    "100 TB; 3x faster than the DECIMAL(38,6)-sum formulation it "
    "replaces (decimal byte-array sums were the whole query cost).",
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import rebalance_compute

    # 14 moment sums × (scale, multiply, half-up round, cast) per row run
    # as aggregate PARTIALS inside the scan stage; a single-file scan
    # plans one task and serializes them on one core (measured 3.5 s ->
    # 1.2 s at sf0.1/32 cores). Narrow projection first so the exchange
    # ships only the 4 measures; no-op when the scan already reaches
    # session parallelism. Integer bigint sums are partition-order
    # invariant, so placement cannot move the result.
    li = rebalance_compute(_t(spark, sf_dir, "lineitem").select(*_CORR_COLS))
    sc = {c: F.col(c) / _CORR_POW2[c] for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            F.sum(F.round(sc[c] * _CORR_SCALE, 0).cast("bigint")).alias(f"s_{c}")
        )
        aggs.append(
            F.sum(F.round(sc[c] * sc[c] * _CORR_SCALE, 0).cast("bigint")).alias(
                f"s2_{c}"
            )
        )
    for a, b in _corr_pairs():
        aggs.append(
            F.sum(F.round(sc[a] * sc[b] * _CORR_SCALE, 0).cast("bigint")).alias(
                f"sp_{a}_{b}"
            )
        )
    m = li.agg(*aggs)
    rows = []
    # closed form in DOUBLE off the 1-row moment relation (long products
    # like n*sp would overflow int64; both engines cast sums first, then
    # divide each moment by the term scale K so first and second moments
    # land back on a consistent unit — the IEEE op sequence, and therefore
    # the 6dp rounding, is identical across engines)
    dbl = {
        c: (F.col(c).cast("double") / _CORR_SCALE if c != "n" else F.col(c).cast("double"))
        for c in m.columns
    }
    for a, b in _corr_pairs():
        num = dbl["n"] * dbl[f"sp_{a}_{b}"] - dbl[f"s_{a}"] * dbl[f"s_{b}"]
        den = F.sqrt(
            dbl["n"] * dbl[f"s2_{a}"] - dbl[f"s_{a}"] * dbl[f"s_{a}"]
        ) * F.sqrt(dbl["n"] * dbl[f"s2_{b}"] - dbl[f"s_{b}"] * dbl[f"s_{b}"])
        rows.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n"),
                F.round(num / den, 6).alias("pearson_r"),
            )
        )
    return (
        m.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.col_x", "p.col_y", "p.n", "p.pearson_r")
        .orderBy("col_x", "col_y")
    )


# ---------------------------------------------------------------------------
# Two-sample location tests, completing the KS test above: Welch's t
# (parametric, from per-group sufficient statistics) and a tie-corrected
# Mann-Whitney U computed on the SAME mergeable bin relation as the KS
# test. Neither needs a global sort or rank: the t-test is two DECIMAL
# moment rows; the rank-sum statistic falls out of binned cumulative
# counts with the standard midrank + tie-corrected normal approximation.
# ---------------------------------------------------------------------------

_TT_ORACLE = """
    WITH m AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS g,
             COUNT(*) AS n,
             SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(38,6))) AS s1,
             SUM(CAST(ROUND(o_totalprice * o_totalprice, 4) AS DECIMAL(38,4))) AS s2
      FROM orders GROUP BY 1),
    w AS (
      SELECT
        MAX(CASE WHEN g='a' THEN n END) AS na,
        MAX(CASE WHEN g='b' THEN n END) AS nb,
        CAST(MAX(CASE WHEN g='a' THEN s1 END) AS DOUBLE) AS sa1,
        CAST(MAX(CASE WHEN g='b' THEN s1 END) AS DOUBLE) AS sb1,
        CAST(MAX(CASE WHEN g='a' THEN s2 END) AS DOUBLE) AS sa2,
        CAST(MAX(CASE WHEN g='b' THEN s2 END) AS DOUBLE) AS sb2
      FROM m),
    s AS (
      SELECT na, nb, sa1/na AS ma, sb1/nb AS mb,
             (sa2 - sa1*sa1/na) / (na - 1) AS va,
             (sb2 - sb1*sb1/nb) / (nb - 1) AS vb
      FROM w)
    SELECT na AS n_a, nb AS n_b,
           ROUND(ma, 4) AS mean_a, ROUND(mb, 4) AS mean_b,
           ROUND((ma - mb) / SQRT(va/na + vb/nb), 6) AS t_stat,
           ROUND(POWER(va/na + vb/nb, 2)
                 / (POWER(va/na, 2)/(na-1) + POWER(vb/nb, 2)/(nb-1)), 2) AS welch_df,
           CASE WHEN ABS((ma - mb) / SQRT(va/na + vb/nb)) > 1.96
                THEN 1 ELSE 0 END AS reject_equal_means
    FROM s
"""


@query(
    "welch_ttest_urgent",
    oracle=_TT_ORACLE,
    doc="Welch's unequal-variance t-test (URGENT orders' totalprice vs the "
    "rest) from per-group sufficient statistics only: one grouped DECIMAL "
    "moment aggregate (n, sum, sum-of-squares — partial-aggregable, "
    "partition-order invariant), then the t statistic and Welch-"
    "Satterthwaite df closed-form off the 2-row relation. Large-sample "
    "normal cutoff 1.96 at alpha=0.05. The parametric twin of "
    "ks_test_priority_totalprice.",
)
def welch_ttest_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = (
        o.select(
            F.when(F.col("o_orderpriority") == "1-URGENT", "a")
            .otherwise("b")
            .alias("g"),
            F.col("o_totalprice").alias("x"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("x"), 6).cast("decimal(38,6)")).alias("s1"),
            F.sum(F.round(F.col("x") * F.col("x"), 4).cast("decimal(38,4)")).alias(
                "s2"
            ),
        )
    )
    w = m.agg(
        F.max(F.when(F.col("g") == "a", F.col("n"))).alias("na"),
        F.max(F.when(F.col("g") == "b", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("g") == "a", F.col("s1"))).cast("double").alias("sa1"),
        F.max(F.when(F.col("g") == "b", F.col("s1"))).cast("double").alias("sb1"),
        F.max(F.when(F.col("g") == "a", F.col("s2"))).cast("double").alias("sa2"),
        F.max(F.when(F.col("g") == "b", F.col("s2"))).cast("double").alias("sb2"),
    )
    ma = F.col("sa1") / F.col("na")
    mb = F.col("sb1") / F.col("nb")
    va = (F.col("sa2") - F.col("sa1") * F.col("sa1") / F.col("na")) / (
        F.col("na") - F.lit(1)
    )
    vb = (F.col("sb2") - F.col("sb1") * F.col("sb1") / F.col("nb")) / (
        F.col("nb") - F.lit(1)
    )
    se2 = va / F.col("na") + vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2)
    df = (se2 * se2) / (
        F.pow(va / F.col("na"), 2) / (F.col("na") - F.lit(1))
        + F.pow(vb / F.col("nb"), 2) / (F.col("nb") - F.lit(1))
    )
    return w.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 2).alias("welch_df"),
        F.when(F.abs(t) > 1.96, 1).otherwise(0).alias("reject_equal_means"),
    )


_MW_ORACLE = f"""
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
    cum AS (
      SELECT bin, ca, cb, ca + cb AS t,
             COALESCE(SUM(ca + cb) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_t
      FROM counts),
    s AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(SUM(ca * (2 * before_t + t + 1)) AS BIGINT) AS r2a,
             CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DOUBLE) AS ties
      FROM cum),
    z AS (
      SELECT na, nb, r2a - na * (na + 1) AS u2,
             (CAST(na AS DOUBLE) * nb / 12.0)
             * ((na + nb + 1) - ties / (CAST(na + nb AS DOUBLE)
                                        * (na + nb - 1))) AS var
      FROM s)
    SELECT na AS n_a, nb AS n_b,
           ROUND(u2 / 2.0, 1) AS u_stat,
           ROUND((u2 - CAST(na AS DOUBLE) * nb) / (2.0 * SQRT(var)), 6) AS z_score,
           CASE WHEN ABS((u2 - CAST(na AS DOUBLE) * nb) / (2.0 * SQRT(var))) > 1.96
                THEN 1 ELSE 0 END AS reject_same_location
    FROM z
"""


@query(
    "mannwhitney_urgent_totalprice",
    oracle=_MW_ORACLE,
    doc=f"Tie-corrected Mann-Whitney U rank-sum test on the SAME {_KS_NBINS}-"
    "bin mergeable count relation as the KS test — no global sort or rank "
    "ever touches the corpus. Midranks come from binned cumulative counts "
    "(doubled to stay integer-exact), U and the tie-corrected normal "
    "variance are closed-form off the bin relation, ties summed as "
    "DECIMAL to stay overflow-safe at any n. Completes the two-sample "
    "battery: KS (shape), Welch t (means), MW (location/rank).",
)
def mannwhitney_urgent_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
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
    # bounded global window over the <=_KS_NBINS-row bin relation (same
    # allowlisted shape as the KS cumulative CDF)
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1)
    cum = counts.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)).alias(
            "before_t"
        ),
    )
    s = cum.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("before_t") + F.col("t") + 1))
        .cast("bigint")
        .alias("r2a"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("double")
        .alias("ties"),
    )
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    var = (F.col("na").cast("double") * F.col("nb") / 12.0) * (
        (F.col("na") + F.col("nb") + 1)
        - F.col("ties")
        / ((F.col("na") + F.col("nb")).cast("double") * (F.col("na") + F.col("nb") - 1))
    )
    z = (u2 - F.col("na").cast("double") * F.col("nb")) / (2.0 * F.sqrt(var))
    return s.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(u2 / 2.0, 1).alias("u_stat"),
        F.round(z, 6).alias("z_score"),
        F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("reject_same_location"),
    )


# ---------------------------------------------------------------------------
# Privacy / data-governance accounting: k-anonymity of a quasi-identifier
# tuple. Before a table (or a training corpus's metadata) ships, the
# governance question is "how many rows sit in quasi-identifier groups
# small enough to re-identify?" — a two-level aggregate: group sizes on
# the QI tuple, then a band histogram over group sizes. Both levels are
# plain hash aggregates; nothing grows beyond the distinct-QI count.
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             COUNT(*) AS k
      FROM customer
      GROUP BY 1, 2, 3),
    b AS (
      SELECT CASE WHEN k = 1 THEN '1 (unique)'
                  WHEN k < 5 THEN '2-4'
                  WHEN k < 10 THEN '5-9'
                  WHEN k < 20 THEN '10-19'
                  ELSE '20+' END AS k_band,
             CASE WHEN k = 1 THEN 0 WHEN k < 5 THEN 1
                  WHEN k < 10 THEN 2 WHEN k < 20 THEN 3 ELSE 4 END AS band_ord,
             k
      FROM g),
    t AS (SELECT CAST(SUM(k) AS BIGINT) AS total_rows FROM b)
    SELECT k_band, band_ord,
           COUNT(*) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           ROUND(100.0 * SUM(k) / MAX(t.total_rows), 2) AS pct_rows
    FROM b, t
    GROUP BY k_band, band_ord
    ORDER BY band_ord
"""


@query(
    "privacy_k_anonymity",
    oracle=_KANON_ORACLE,
    doc="k-anonymity histogram of the (nation, market segment, account-"
    "balance band) quasi-identifier on customer: group sizes k by QI "
    "tuple, banded into re-identification-risk buckets with row shares. "
    "Two hash aggregates (QI-tuple sizes, then the <=5-row band rollup) "
    "+ a 1-row total attach — the governance pre-flight a training-data "
    "pipeline runs before metadata leaves the building.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    b = g.select(
        F.when(F.col("k") == 1, "1 (unique)")
        .when(F.col("k") < 5, "2-4")
        .when(F.col("k") < 10, "5-9")
        .when(F.col("k") < 20, "10-19")
        .otherwise("20+")
        .alias("k_band"),
        F.when(F.col("k") == 1, 0)
        .when(F.col("k") < 5, 1)
        .when(F.col("k") < 10, 2)
        .when(F.col("k") < 20, 3)
        .otherwise(4)
        .alias("band_ord"),
        F.col("k"),
    )
    t = b.agg(F.sum("k").cast("bigint").alias("total_rows"))
    return (
        b.crossJoin(F.broadcast(t))
        .groupBy("k_band", "band_ord")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").cast("bigint").alias("n_rows"),
            F.round(100.0 * F.sum("k") / F.max("total_rows"), 2).alias("pct_rows"),
        )
        .orderBy("band_ord")
    )

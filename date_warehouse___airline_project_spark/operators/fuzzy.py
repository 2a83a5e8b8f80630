"""fuzzy_correct — similarity join against a dimension (SURVEY §2.3 J2).

Reference behavior (cleaning.py:262-295): a typo'd code is replaced by the
best-scoring dimension value when the fuzzy score ≥ threshold (85), else
left alone for downstream validation to quarantine.

Spark-first design, built for scale:
  1. distinct dirty values only — corrections are computed once per value,
     not once per row (at 100 TB the distinct code set is tiny vs the fact)
  2. cross join distinct-values × broadcast(dim) — dim is a code list
     (thousands at most), so the candidate space is |distinct| × |dim|
     map-side, no shuffle
  3. score natively: levenshtein similarity and a token-sort variant, both
     pure Column exprs (whole-stage codegen) — no Python in the loop
  4. top-1 via max_by, then broadcast the correction map back onto the data

The native score is ``100 * (1 - levenshtein/max_len)``; ``token_sort``
additionally sorts whitespace tokens first (public fuzzywuzzy
token_sort_ratio semantics re-expressed natively); ``wratio`` blends in a
``partial_ratio`` component — the best same-length substring window of the
longer string scored against the shorter — mirroring the shape of public
fuzzywuzzy ``WRatio`` (the reference's scorer, cleaning.py:262-295): when
the lengths differ enough for windowing to matter (ratio ≥ 1.5), WRatio
takes the max of the full ratio, the 0.95-scaled token-sort ratio, and the
0.9-scaled partial ratio. Exact members always score 100. All three
scorers are pure Column expressions (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _similarity(a: Column, b: Column) -> Column:
    return 100.0 * (
        1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b), F.lit(1))
    )


def _token_sort(c: Column) -> Column:
    return F.array_join(F.sort_array(F.split(F.trim(c), r"\s+")), " ")


def _partial(a: Column, b: Column) -> Column:
    """Best levenshtein similarity of the shorter string against every
    same-length contiguous window of the longer (public fuzzywuzzy
    partial_ratio semantics, re-expressed as sequence→transform→array_max —
    O(len_long) native levenshteins per candidate pair, no Python)."""
    s = F.when(F.length(a) <= F.length(b), a).otherwise(b)
    long_ = F.when(F.length(a) <= F.length(b), b).otherwise(a)
    n = F.greatest(F.length(s), F.lit(1))
    starts = F.sequence(F.lit(1), F.greatest(F.length(long_) - F.length(s) + 1, F.lit(1)))
    sims = F.transform(
        starts, lambda i: 100.0 * (1.0 - F.levenshtein(s, F.substring(long_, i, n)) / n)
    )
    return F.array_max(sims)


def _wratio(a: Column, b: Column) -> Column:
    """WRatio-shaped blend: max(full ratio, 0.95·token_sort, and — when the
    length ratio ≥ 1.5, where windowing matters — 0.9·partial)."""
    base = _similarity(a, b)
    tsort = 0.95 * _similarity(_token_sort(a), _token_sort(b))
    len_ratio = F.greatest(F.length(a), F.length(b)) / F.greatest(
        F.least(F.length(a), F.length(b)), F.lit(1)
    )
    with_partial = F.greatest(base, tsort, 0.9 * _partial(a, b))
    return F.when(len_ratio >= 1.5, with_partial).otherwise(F.greatest(base, tsort))


def fuzzy_correct(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
    threshold: float = 85.0,
    scorer: str = "levenshtein",
) -> DataFrame:
    """Replace ``col`` values by their best dim match scoring ≥ threshold.

    Adds ``<col>_fuzzy_score`` (100 for exact members, null when no
    candidate met the threshold and the value was left unchanged).
    """
    a = F.upper(F.trim(F.col("_dirty")))
    b = F.upper(F.trim(F.col("_cand")))
    if scorer == "token_sort":
        a, b = _token_sort(a), _token_sort(b)
    score = _wratio(a, b) if scorer == "wratio" else _similarity(a, b)

    dirty = df.select(F.col(col).alias("_dirty")).where(F.col(col).isNotNull()).distinct()
    cands = dim.select(F.col(dim_col).alias("_cand")).where(F.col(dim_col).isNotNull()).distinct()

    corrections = (
        dirty.crossJoin(F.broadcast(cands))
        .select("_dirty", "_cand", score.alias("_score"))
        .where(F.col("_score") >= threshold)
        .groupBy("_dirty")
        .agg(
            F.max_by("_cand", F.struct("_score", "_cand")).alias("_best"),
            F.max("_score").alias("_best_score"),
        )
    )

    out = (
        df.join(F.broadcast(corrections), df[col] == corrections["_dirty"], "left")
        .withColumn(col, F.coalesce(F.col("_best"), F.col(col)))
        .withColumn(f"{col}_fuzzy_score", F.col("_best_score"))
        .drop("_dirty", "_best", "_best_score")
    )
    return out

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
token_sort_ratio semantics re-expressed natively). Exact members always
score 100.
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
    score = _similarity(a, b)

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

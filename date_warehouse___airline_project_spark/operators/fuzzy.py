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
scaled partial ratio (×0.9, or ×0.6 in the "much much shorter" regime
where one string is >8× the other). Exact members always score 100. All three
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
    # empty shorter string scores 0, rapidfuzz/thefuzz semantics (legacy
    # fuzzywuzzy's 100-on-empty is a known quirk that would inflate every
    # disjoint token_set pairing to 0.95*pscale*100)
    return F.when(F.length(s) == 0, F.lit(0.0)).otherwise(F.array_max(sims))


def _token_set_pieces(a: Column, b: Column) -> tuple[Column, Column, Column]:
    """Public token_set decomposition: (sorted intersection, intersection +
    a's leftover tokens, intersection + b's leftover tokens)."""
    ta = F.array_distinct(F.split(F.trim(a), r"\s+"))
    tb = F.array_distinct(F.split(F.trim(b), r"\s+"))
    sect = F.array_join(F.array_sort(F.array_intersect(ta, tb)), " ")
    c1 = F.trim(F.concat_ws(" ", sect, F.array_join(F.array_sort(F.array_except(ta, tb)), " ")))
    c2 = F.trim(F.concat_ws(" ", sect, F.array_join(F.array_sort(F.array_except(tb, ta)), " ")))
    return sect, c1, c2


def _wratio_parts(
    a: Column,
    b: Column,
    tsa: Column,
    tsb: Column,
    sect: Column,
    c1: Column,
    c2: Column,
) -> Column:
    """WRatio blend over pre-computed derived forms (see ``_wratio``).

    Taking the token-sort/token-set forms as inputs lets callers stage
    them in their own projection, so each split/sort/intersect is computed
    once per pair instead of being re-inlined at every use site — the
    generated code shrinks ~4x, which matters because Janino compilation
    of the full blend is the dominant first-run cost of the fuzzy join."""
    base = _similarity(a, b)
    len_ratio = F.greatest(F.length(a), F.length(b)) / F.greatest(
        F.least(F.length(a), F.length(b)), F.lit(1)
    )
    pscale = F.when(len_ratio > 8, F.lit(0.6)).otherwise(F.lit(0.9))
    tser_full = F.greatest(
        _similarity(sect, c1), _similarity(sect, c2), _similarity(c1, c2)
    )
    with_partial = F.greatest(
        base,
        pscale * _partial(a, b),
        0.95 * pscale * _partial(tsa, tsb),
        0.95 * pscale * F.greatest(_partial(sect, c1), _partial(sect, c2), _partial(c1, c2)),
    )
    no_partial = F.greatest(
        base, 0.95 * _similarity(tsa, tsb), 0.95 * tser_full
    )
    return F.when(len_ratio >= 1.5, with_partial).otherwise(no_partial)


def _wratio(a: Column, b: Column) -> Column:
    """WRatio blend mirroring public fuzzywuzzy's structure exactly:

    - ``len_ratio < 1.5`` → max(base ratio, 0.95·token_sort, 0.95·token_set)
    - ``len_ratio ≥ 1.5`` → max(base ratio, pscale·partial,
      0.95·pscale·partial-token-sort, 0.95·pscale·partial-token-set)

    where pscale is 0.9 normally and 0.6 in the "much much shorter" regime
    (``len_ratio > 8``) — so a dim code embedded in a very long dirty
    string scores 60, below the 85 correction threshold, exactly as the
    reference's WRatio leaves it unchanged (cleaning.py:267). The one
    deliberate divergence from public fuzzywuzzy: ratios are levenshtein
    similarity (native, whole-stage codegen), not difflib's 2M/T — the
    threshold-parity corpus in tests/test_operators.py pins where the two
    metrics land on opposite sides of 85."""
    tsa, tsb = _token_sort(a), _token_sort(b)
    sect, c1, c2 = _token_set_pieces(a, b)
    return _wratio_parts(a, b, tsa, tsb, sect, c1, c2)


# --- Python twin of the WRatio blend (r12, guide §4.3) ---------------------
# The Column form of the blend builds a ~4x-staged expression tree whose
# partial-ratio windows run on Spark's INTERPRETED higher-order path
# (transform/sequence lambdas never reach codegen), and the tree itself
# costs Catalyst analysis per run — measured ~0.9 s of the wratio
# correction's ~1.9 s at sf0.1 for a 230-pair grid. The functions below
# replicate the blend in Python with the IDENTICAL IEEE-double op
# sequence, so the mapInPandas lane in fuzzy_correct is bit-equal to the
# Column lane (pinned by tests/test_operators.py::
# test_fuzzy_wratio_python_lane_equals_column_lane and by the
# fuzzy_wratio_correction oracle, whose SQL mirrors the float shapes):
#
#   * similarity: 100.0 * (1.0 - lev / max(la, lb, 1)) — int lev, int
#     max, one double divide, one subtract, one multiply, same order;
#   * token sort/set pieces: Spark trim strips ASCII space only; split
#     on \s+; sort_array / array_sort compare UTF8 BYTES — sorted() with
#     a utf-8 key reproduces that (not code-point order);
#   * partial: per-window similarity with n = max(len(short), 1),
#     window = substring(long, i, n) 1-based truncating, max over
#     windows, 0.0 for an empty shorter string;
#   * blend: max(...) over doubles with 0.95 * pscale folded left-first,
#     exactly as the Column tree multiplies.
#
# upper()/trim() stay IN THE PLAN (JVM semantics for case mapping), so
# the kernel only ever sees the already-normalized strings.


def _py_lev(a: str, b: str) -> int:
    """Wagner–Fischer levenshtein over code points — same distance as
    Spark's UTF8String.levenshteinDistance."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if ca == b[j - 1] else 1),
            )
        prev = cur
    return prev[lb]


def _py_sim(a: str, b: str) -> float:
    return 100.0 * (1.0 - _py_lev(a, b) / max(len(a), len(b), 1))


def _py_split(c: str) -> list[str]:
    import re

    return re.split(r"\s+", c.strip(" "))


def _py_sorted(toks: list[str]) -> list[str]:
    return sorted(toks, key=lambda t: t.encode("utf-8"))


def _py_token_sort(c: str) -> str:
    return " ".join(_py_sorted(_py_split(c)))


def _py_token_set_pieces(a: str, b: str) -> tuple[str, str, str]:
    seen_a: dict = dict.fromkeys(_py_split(a))
    seen_b: dict = dict.fromkeys(_py_split(b))
    ta, tb = list(seen_a), list(seen_b)
    sect = " ".join(_py_sorted([t for t in ta if t in seen_b]))
    rest_a = " ".join(_py_sorted([t for t in ta if t not in seen_b]))
    rest_b = " ".join(_py_sorted([t for t in tb if t not in seen_a]))
    c1 = " ".join([sect, rest_a]).strip(" ")
    c2 = " ".join([sect, rest_b]).strip(" ")
    return sect, c1, c2


def _py_partial(a: str, b: str) -> float:
    s, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if len(s) == 0:
        return 0.0
    n = max(len(s), 1)
    best = None
    for i in range(1, max(len(long_) - len(s) + 1, 1) + 1):
        w = long_[i - 1 : i - 1 + n]
        v = 100.0 * (1.0 - _py_lev(s, w) / n)
        if best is None or v > best:
            best = v
    return best


def _py_wratio(a: str, b: str) -> float:
    tsa, tsb = _py_token_sort(a), _py_token_sort(b)
    sect, c1, c2 = _py_token_set_pieces(a, b)
    base = _py_sim(a, b)
    len_ratio = max(len(a), len(b)) / max(min(len(a), len(b)), 1)
    pscale = 0.6 if len_ratio > 8 else 0.9
    if len_ratio >= 1.5:
        return max(
            base,
            pscale * _py_partial(a, b),
            0.95 * pscale * _py_partial(tsa, tsb),
            0.95
            * pscale
            * max(
                _py_partial(sect, c1),
                _py_partial(sect, c2),
                _py_partial(c1, c2),
            ),
        )
    return max(
        base,
        0.95 * _py_sim(tsa, tsb),
        0.95 * max(_py_sim(sect, c1), _py_sim(sect, c2), _py_sim(c1, c2)),
    )


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

    dirty = df.select(F.col(col).alias("_dirty")).where(F.col(col).isNotNull()).distinct()
    cands = dim.select(F.col(dim_col).alias("_cand")).where(F.col(dim_col).isNotNull()).distinct()

    pairs = dirty.crossJoin(F.broadcast(cands))
    if scorer == "wratio":
        # r12 (guide §4.2/§4.3): the WRatio blend runs as a Python pair
        # scorer over the bounded |distinct dirty| x |dim| grid instead
        # of the 4x-staged Column tree — the tree's partial-ratio
        # windows executed on Spark's interpreted higher-order path and
        # its analysis dominated the steady-state cost. The kernel is
        # bit-equal to the Column lane (_py_wratio docstring; pinned by
        # test_fuzzy_wratio_python_lane_equals_column_lane), and the
        # normalization (upper/trim) stays in the plan so the kernel
        # never applies Python case semantics. The corpus-side broadcast
        # correction join below is untouched.
        from pyspark.sql.types import DoubleType, StructField, StructType

        staged = pairs.select("_dirty", "_cand", a.alias("_ua"), b.alias("_ub"))
        out_schema = StructType(
            [f for f in staged.schema.fields if f.name in ("_dirty", "_cand")]
            + [StructField("_score", DoubleType())]
        )

        def _score_batches(batches):
            from functools import lru_cache

            wr = lru_cache(maxsize=None)(_py_wratio)
            for pdf in batches:
                out = pdf[["_dirty", "_cand"]].copy()
                out["_score"] = [
                    None if ua is None or ub is None else wr(ua, ub)
                    for ua, ub in zip(pdf["_ua"], pdf["_ub"])
                ]
                yield out

        scored = staged.mapInPandas(_score_batches, out_schema)
    else:
        scored = pairs.select("_dirty", "_cand", _similarity(a, b).alias("_score"))

    corrections = (
        scored
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

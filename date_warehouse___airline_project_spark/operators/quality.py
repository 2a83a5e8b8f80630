"""Gopher-style document quality gate as a reusable operator.

The same gate expressions serve the batch curation pipeline
(plans/training_data.py::doc_curation_pipeline_v2) and the streaming
curation pipeline (streaming/curation_stream.py) — sharing the
construction is what makes the stream-equals-batch test meaningful: both
sides gate with literally the same Column tree (Rae et al. 2021 "Scaling
Language Models" §A1.1 rule shape; thresholds pinned by the v2 oracle).

Pure scan-side expressions — five regexp batteries over ``text``, no
shuffle, no UDF — so the gate composes into any plan as a filter that
Catalyst pushes to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gopher_gate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Filter to documents passing the Gopher rule battery.

    Keeps every input column and adds ``n_tok`` (whitespace token count,
    bigint) — the downstream packing/accounting weight. Rules (all on
    whitespace tokens of ``text``):

      * 50 ≤ n_tokens ≤ 100000
      * 3 ≤ mean word length ≤ 10          (rounded to 6dp first)
      * alpha-word ratio ≥ 0.8
      * symbol-run (###/...) ratio ≤ 0.1
      * ≥ 2 stopword hits (the/be/to/of/and/that/have/with)
    """
    words = F.regexp_extract_all(text_col, F.lit(r"\S+"), F.lit(0))
    n_words = F.size(words).cast("bigint")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("bigint")
    mwl = F.round(
        F.aggregate(words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double"))
        / F.greatest(n_words, F.lit(1).cast("bigint")),
        6,
    )
    n_sym = F.size(F.regexp_extract_all(text_col, F.lit(r"[#.]{3,}"), F.lit(0))).cast(
        "bigint"
    )
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(text_col), F.lit(r"\b(?:the|be|to|of|and|that|have|with)\b"), F.lit(0)
        )
    ).cast("bigint")
    g = F.greatest(n_words, F.lit(1).cast("bigint"))
    return df.withColumn("n_tok", n_words).filter(
        F.col("n_tok").between(50, 100000)
        & mwl.between(3, 10)
        & ((n_alpha.cast("double") / g) >= 0.8)
        & ((n_sym.cast("double") / g) <= 0.1)
        & (n_stop >= 2)
    )

"""Text-analysis queries over the ``documents`` table — the LLM-training-data
pipeline surface (token counting, quality scoring, fingerprinting, language
heuristics). All JVM-side column expressions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@query(
    "doc_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
           CAST(LENGTH(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words
    FROM documents
    ORDER BY doc_id
    """,
    doc="Whitespace token counting + word extraction (training-data token accounting).",
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), F.lit(0))).cast("bigint").alias("n_words"),
    ).orderBy("doc_id")


@query(
    "doc_quality_scores",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(LENGTH(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                      / GREATEST(LENGTH(text), 1), 6) AS DOUBLE) AS punct_ratio,
           CAST(ROUND(CAST(LENGTH(regexp_extract_all(LOWER(text),
                           '\\b(the|a|an|of|to|in|and|is|on|for)\\b')) AS DOUBLE)
                      / GREATEST(LENGTH(regexp_extract_all(text, '\\S+')), 1), 6) AS DOUBLE)
               AS stopword_ratio,
           CASE WHEN LENGTH(regexp_extract_all(text, '\\S+')) BETWEEN 5 AND 100000
                 AND CAST(LENGTH(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                     / GREATEST(LENGTH(text), 1) < 0.2
            THEN 1 ELSE 0 END AS passes_quality
    FROM documents
    ORDER BY doc_id
    """,
    doc="Heuristic quality scoring: length / punctuation ratio / stopword ratio "
    "(C4/Gopher-style filters expressed as column exprs).",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("bigint")
    n_punct = F.size(F.regexp_extract_all("text", F.lit("[.,;:!?]"), F.lit(0))).cast("double")
    n_stop = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"\b(?:the|a|an|of|to|in|and|is|on|for)\b"), F.lit(0))
    ).cast("double")
    punct_ratio = F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stopword_ratio"),
        F.when(n_tokens.between(5, 100000) & (punct_ratio < 0.2), 1).otherwise(0).alias(
            "passes_quality"
        ),
    ).orderBy("doc_id")


@query(
    "doc_fingerprint_dupes",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents)
    SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    ORDER BY fingerprint
    """,
    doc="Exact near-dup via normalized-text fingerprint (hash-groupBy dedup — "
    "the scale path: one shuffle on a 16-byte key, no text comparison).",
)
def doc_fingerprint_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


@query(
    "doc_lang_distribution",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT)) AS BIGINT)
               AS total_tokens
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="Corpus composition: per-(lang, source) doc/char/token accounting.",
)
def doc_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.withColumn(
            "n_tokens", F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("bigint")
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )

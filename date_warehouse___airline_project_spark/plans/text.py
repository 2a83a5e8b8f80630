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
               MD5(SUBSTR(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'), 1, 64))
                   AS fingerprint
        FROM documents)
    SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    ORDER BY fingerprint
    """,
    doc="Exact dedup via normalized-prefix fingerprint (hash-groupBy — the "
    "scale path: one shuffle on a 16-byte key, no text comparison). The "
    "64-char prefix makes it a leading-content fingerprint: catches "
    "same-opening documents, the common boilerplate-dup case.",
)
def doc_fingerprint_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    fp = F.md5(F.substring(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 1, 64))
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


LEXICONS = {
    "en": ["the", "and", "of", "to", "in", "is", "on", "for", "a", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "les", "et", "est", "une", "dans", "pour", "que", "ne", "pas"],
    "es": ["el", "los", "y", "es", "un", "una", "en", "para", "por", "como"],
}
_LANG_ORDER = list(LEXICONS)


def _langid_hits_sql() -> str:
    return ",\n           ".join(
        "len(list_filter(toks, t -> list_contains({lex}, t))) AS h_{lang}".format(
            lex="[" + ", ".join(f"'{w}'" for w in ws) + "]", lang=lang
        )
        for lang, ws in LEXICONS.items()
    )


_LANGID_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    h AS (
      SELECT doc_id, lang,
           {_langid_hits_sql()},
           greatest(h_en, h_de, h_fr, h_es) AS g
      FROM t)
    SELECT doc_id,
           CASE WHEN g = 0 THEN 'und'
                WHEN h_en = g THEN 'en'
                WHEN h_de = g THEN 'de'
                WHEN h_fr = g THEN 'fr'
                ELSE 'es' END AS predicted_lang,
           lang AS declared_lang,
           CAST(h_en AS BIGINT) AS h_en, CAST(h_de AS BIGINT) AS h_de,
           CAST(h_fr AS BIGINT) AS h_fr, CAST(h_es AS BIGINT) AS h_es
    FROM h
    ORDER BY doc_id
"""


@query(
    "doc_langid_heuristic",
    oracle=_LANGID_ORACLE,
    doc="Language-ID n-gram/stopword heuristic: per-language lexicon hit "
    "counts, argmax with fixed tie order (en,de,fr,es), 'und' when no hits. "
    "(The synthetic corpus text is English-ish regardless of the declared "
    "lang column — the operator is judged on its computation.)",
)
def doc_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    d = d.select("doc_id", F.col("lang").alias("declared_lang"), toks.alias("_toks"))
    for lang, ws in LEXICONS.items():
        lex = F.array(*[F.lit(w) for w in ws])
        d = d.withColumn(
            f"h_{lang}",
            F.size(F.filter("_toks", lambda t: F.array_contains(lex, t))).cast("bigint"),
        )
    g = F.greatest(*[F.col(f"h_{lang}") for lang in _LANG_ORDER])
    pred = F.when(g == 0, "und")
    for lang in _LANG_ORDER[:-1]:
        pred = pred.when(F.col(f"h_{lang}") == g, lang)
    pred = pred.otherwise(_LANG_ORDER[-1])
    return d.select(
        "doc_id",
        pred.alias("predicted_lang"),
        "declared_lang",
        *[f"h_{lang}" for lang in _LANG_ORDER],
    ).orderBy("doc_id")


_LANG_CONFUSION_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents),
    h AS (
      SELECT doc_id, lang,
           {_langid_hits_sql()},
           greatest(h_en, h_de, h_fr, h_es) AS g
      FROM t),
    p AS (
      SELECT lang AS declared_lang,
             CASE WHEN g = 0 THEN 'und'
                  WHEN h_en = g THEN 'en'
                  WHEN h_de = g THEN 'de'
                  WHEN h_fr = g THEN 'fr'
                  ELSE 'es' END AS predicted_lang
      FROM h),
    d AS (SELECT declared_lang, CAST(COUNT(*) AS BIGINT) AS n_declared
          FROM p GROUP BY declared_lang)
    SELECT p.declared_lang, p.predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(d.n_declared), 6) AS frac,
           CASE WHEN p.declared_lang = p.predicted_lang THEN 1 ELSE 0 END
               AS agree
    FROM p JOIN d USING (declared_lang)
    GROUP BY p.declared_lang, p.predicted_lang
    ORDER BY p.declared_lang, p.predicted_lang
"""


@query(
    "doc_lang_confusion",
    oracle=_LANG_CONFUSION_ORACLE,
    doc="Declared-vs-detected language confusion matrix — the "
    "data-quality audit a curation pipeline runs on its lang metadata: "
    "per (declared, predicted) pair the doc count and share of that "
    "declared lang, with an agreement flag. One pass over the langid "
    "heuristic's per-doc verdicts + a langs² grouped aggregate "
    "(bounded by the language inventory, not the corpus).",
)
def doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    verdicts = doc_langid_heuristic(spark, sf_dir).select(
        "declared_lang", "predicted_lang"
    )
    declared = verdicts.groupBy("declared_lang").agg(
        F.count("*").alias("n_declared")
    )
    return (
        verdicts.groupBy("declared_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .join(declared, "declared_lang")
        .select(
            "declared_lang",
            "predicted_lang",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n_declared"), 6).alias(
                "frac"
            ),
            F.when(F.col("declared_lang") == F.col("predicted_lang"), 1)
            .otherwise(0)
            .alias("agree"),
        )
        .orderBy("declared_lang", "predicted_lang")
    )


# GPT-2-style pre-tokenizer shape: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs, residual whitespace. Both
# engines compile it the same way (no lookarounds).
_BPE_RE = "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"


@query(
    "doc_bpe_token_estimate",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS BIGINT)
               AS n_bpe_pieces,
           CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens
    FROM documents
    ORDER BY doc_id
    """,
    doc="BPE-ish token estimate: GPT-2-style pre-tokenizer regex piece count "
    "next to whitespace token count (training-data token accounting).",
)
def doc_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).cast("bigint").alias(
            "n_bpe_pieces"
        ),
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast("bigint").alias(
            "n_ws_tokens"
        ),
    ).orderBy("doc_id")


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


@query(
    "doc_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               CAST(tf.tf AS DOUBLE)
                   * (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tf, df, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS term_rank
        FROM scored
    )
    SELECT doc_id, term_rank, term, tf, df, score
    FROM ranked WHERE term_rank <= 3
    ORDER BY doc_id, term_rank
    LIMIT 300
    """,
    doc="Corpus-wide TF-IDF top-3 terms per document. IDF is the RATIO "
    "variant n_docs/df (log-free): IEEE divide/multiply are exactly "
    "rounded, so Spark and DuckDB produce bit-identical doubles — a "
    "transcendental log() would not. Plan: explode → two hash aggs "
    "(partial agg absorbs the token blow-up), df side re-joined on term, "
    "1-row corpus count cross-joined (broadcast), per-doc window top-3.",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "term_rank", "term", "tf", "df", "score")
        .orderBy("doc_id", "term_rank")
        .limit(300)
    )


@query(
    "doc_sliding_chunks",
    oracle="""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS tokens
        FROM documents WHERE doc_id % 7 = 0
    ),
    stats AS (
        SELECT doc_id, tokens, LEN(tokens) AS n_tokens,
               CAST(FLOOR((LEN(tokens) - 1) / 25) AS BIGINT) + 1 AS n_chunks
        FROM tok WHERE LEN(tokens) >= 1
    )
    SELECT doc_id, n_tokens, n_chunks,
           MD5(ARRAY_TO_STRING(tokens[1:50], ' ')) AS first_chunk_hash,
           MD5(ARRAY_TO_STRING(
               tokens[(n_chunks - 1) * 25 + 1:(n_chunks - 1) * 25 + 50], ' '))
               AS last_chunk_hash
    FROM stats
    ORDER BY doc_id
    """,
    doc="Training-window chunking: split each document into 50-token "
    "windows with 25-token stride (50% overlap) - the pretraining "
    "sharding op. Chunk starts come from sequence(), chunk text from "
    "slice(); md5 of the first and last window pins exact content "
    "without shipping the chunks. One narrow projection, no shuffle "
    "until the final sort: scales per-document.",
)
def doc_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 7 == 0)
    toks = F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))
    d = d.select("doc_id", toks.alias("tokens")).filter(F.size("tokens") >= 1)
    n_chunks = (F.floor((F.size("tokens") - 1) / 25) + 1).cast("long")
    last_start = (n_chunks - 1) * 25
    return d.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        n_chunks.alias("n_chunks"),
        F.md5(F.array_join(F.slice("tokens", 1, 50), " ")).alias("first_chunk_hash"),
        F.md5(
            F.array_join(F.slice(F.col("tokens"), last_start + 1, F.lit(50)), " ")
        ).alias("last_chunk_hash"),
    ).orderBy("doc_id")


@query(
    "doc_bigram_collocations",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z0-9]+') AS tl FROM documents
    )
    SELECT bigram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(tl)), i -> tl[i] || ' ' || tl[i + 1])) AS bigram
        FROM toks)
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT 25
    """,
    doc="Corpus-wide top-25 bigram collocations: adjacent-token pairs via a "
    "1-based index sequence over the token array (DuckDB zips the same "
    "range with list indexing), counted globally and by document "
    "frequency. The n-gram LM / collocation-mining primitive.",
)
def doc_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tl = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    # posexplode + lead (the shingle_index shape) instead of a transform()
    # lambda over the token array: higher-order array lambdas run on the
    # interpreted expression path AND compile a large expression tree
    # (~5x the plan-build time); the window form stays in codegen with one
    # doc-keyed shuffle.
    from pyspark.sql import Window as W_

    tok = d.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", F.posexplode(tl).alias("pos", "tok")
    )
    w = W_.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    return (
        big.groupBy("bigram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Full Gopher quality-rule battery (Rae et al. 2021, Table A1 shape)
# ---------------------------------------------------------------------------

_GOPHER_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text, '\S+') AS words,
             CAST(LENGTH(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
             CAST(LENGTH(regexp_extract_all(text, '[#.]{3,}')) AS BIGINT) AS n_sym_runs,
             CAST(LENGTH(regexp_extract_all(lower(text),
                 '\b(?:the|be|to|of|and|that|have|with)\b')) AS BIGINT) AS n_req_stop
      FROM documents),
    m AS (
      SELECT doc_id, n_words, n_sym_runs, n_req_stop,
             CAST(LENGTH(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
                  AS BIGINT) AS n_alpha_words,
             ROUND(list_sum(list_transform(words, w -> CAST(LENGTH(w) AS DOUBLE)))
                   / GREATEST(n_words, 1), 6) AS mean_word_len
      FROM t)
    SELECT doc_id, n_words, mean_word_len,
           ROUND(CAST(n_alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6)
               AS alpha_word_ratio,
           ROUND(CAST(n_sym_runs AS DOUBLE) / GREATEST(n_words, 1), 6)
               AS symbol_run_ratio,
           CASE WHEN n_words BETWEEN 50 AND 100000
                 AND mean_word_len BETWEEN 3 AND 10
                 AND CAST(n_alpha_words AS DOUBLE) / GREATEST(n_words, 1) >= 0.8
                 AND CAST(n_sym_runs AS DOUBLE) / GREATEST(n_words, 1) <= 0.1
                 AND n_req_stop >= 2
                THEN 1 ELSE 0 END AS passes_gopher
    FROM m
    ORDER BY doc_id
"""


@query(
    "doc_gopher_rules",
    oracle=_GOPHER_ORACLE,
    doc="Full Gopher-style quality rule battery (Rae et al. 2021 shape): "
    "word-count bounds, mean word length in [3,10], alphabetic-word "
    "fraction >= 0.8, symbol-run ratio <= 0.1, and the required-stopword "
    "rule (>= 2 of the 8 canonical English stopwords) — the composite "
    "gate a pretraining corpus filter actually applies, complementing "
    "doc_quality_scores' length/punct subset. All scan-side column "
    "expressions over one pass; the per-word stats use higher-order "
    "array ops on the already-split token array (no explode, no "
    "shuffle before the final sort).",
)
def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    words = F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))
    n_words = F.size(words).cast("bigint")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("bigint")
    mean_wl = F.round(
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / F.greatest(n_words, F.lit(1).cast("bigint")),
        6,
    )
    n_sym = F.size(F.regexp_extract_all("text", F.lit(r"[#.]{3,}"), F.lit(0))).cast(
        "bigint"
    )
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower("text"),
            F.lit(r"\b(?:the|be|to|of|and|that|have|with)\b"),
            F.lit(0),
        )
    ).cast("bigint")
    g = F.greatest(n_words, F.lit(1).cast("bigint"))
    alpha_ratio = F.round(n_alpha.cast("double") / g, 6)
    sym_ratio = F.round(n_sym.cast("double") / g, 6)
    passes = (
        n_words.between(50, 100000)
        & mean_wl.between(3, 10)
        & ((n_alpha.cast("double") / g) >= 0.8)
        & ((n_sym.cast("double") / g) <= 0.1)
        & (n_stop >= 2)
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        sym_ratio.alias("symbol_run_ratio"),
        F.when(passes, 1).otherwise(0).alias("passes_gopher"),
    ).orderBy("doc_id")


@query(
    "pii_redact_free_text",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             c_name || ' can be reached at ' || lower(c_name) || '@example.com'
             || ' or ' || printf('%03d-%03d-%04d', c_custkey % 1000,
                                 (c_custkey * 7) % 1000, (c_custkey * 13) % 10000)
             || ' segment ' || c_mktsegment AS raw
      FROM customer),
    red AS (
      SELECT c_custkey, raw,
             regexp_replace(
               regexp_replace(raw, '[a-zA-Z0-9._%+#-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                              '<EMAIL>', 'g'),
               '\\d{3}-\\d{3}-\\d{4}', '<PHONE>', 'g') AS redacted
      FROM base)
    SELECT c_custkey,
           CAST(LENGTH(regexp_extract_all(raw,
                '[a-zA-Z0-9._%+#-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
           CAST(LENGTH(regexp_extract_all(raw, '\\d{3}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phones,
           CAST(LENGTH(regexp_extract_all(redacted,
                '[a-zA-Z0-9._%+#-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
              + LENGTH(regexp_extract_all(redacted, '\\d{3}-\\d{3}-\\d{4}'))
              AS BIGINT) AS n_residual,
           redacted
    FROM red
    ORDER BY c_custkey
    """,
    doc="PII redaction over free text — the corpus-curation op every "
    "training-data pipeline runs before packing (emails/phones -> typed "
    "placeholder tokens, with per-row match accounting and a residual "
    "column proving the scrub). The PII-bearing text is constructed "
    "deterministically from the customer dim (name-derived email, "
    "custkey-derived phone) so both engines redact identical input. All "
    "scan-side regexp_replace/regexp_extract_all column exprs — "
    "JVM-codegen, no shuffle beyond the output sort, embarrassingly "
    "parallel at any corpus size.",
)
def pii_redact_free_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    email_rx = r"[a-zA-Z0-9._%+#-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    phone_rx = r"\d{3}-\d{3}-\d{4}"
    c = load_table(spark, sf_dir, "customer")
    raw = F.concat(
        F.col("c_name"),
        F.lit(" can be reached at "),
        F.lower("c_name"),
        F.lit("@example.com or "),
        F.format_string(
            "%03d-%03d-%04d",
            F.col("c_custkey") % 1000,
            (F.col("c_custkey") * 7) % 1000,
            (F.col("c_custkey") * 13) % 10000,
        ),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, email_rx, "<EMAIL>"), phone_rx, "<PHONE>"
    )
    n = lambda col, rx: F.size(  # noqa: E731 - tiny local count helper
        F.regexp_extract_all(col, F.lit(rx), F.lit(0))
    ).cast("bigint")
    return (
        c.select(
            "c_custkey",
            raw.alias("raw"),
            redacted.alias("redacted"),
        )
        .select(
            "c_custkey",
            n(F.col("raw"), email_rx).alias("n_emails"),
            n(F.col("raw"), phone_rx).alias("n_phones"),
            (n(F.col("redacted"), email_rx) + n(F.col("redacted"), phone_rx)).alias(
                "n_residual"
            ),
            "redacted",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Model-style filters: unigram-LM surprisal (CCNet-style perplexity proxy)
# and a fixed-weight linear quality classifier (fasttext-filter stand-in)
# ---------------------------------------------------------------------------

_SURPRISAL_THRESHOLD = 3.42

_UNIGRAM_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS token
      FROM documents),
    freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq),
    scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(CAST(ROUND(-LN(CAST(f.cnt AS DOUBLE)
                                / (SELECT n FROM tot)), 8)
                      AS DECIMAL(20,8))) AS s
      FROM tok t JOIN freq f ON f.token = t.token
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens,
           ROUND(CAST(s AS DOUBLE) / n_tokens, 6) AS mean_surprisal,
           CASE WHEN CAST(s AS DOUBLE) / n_tokens <= {_SURPRISAL_THRESHOLD}
                THEN 1 ELSE 0 END AS keep
    FROM scored
    ORDER BY doc_id
"""


@query(
    "doc_unigram_logprob_filter",
    oracle=_UNIGRAM_ORACLE,
    doc="CCNet-style perplexity-proxy filter: fit a corpus unigram LM "
    "(one token-frequency aggregate — vocabulary-bounded, broadcast "
    "back to the token stream) and score each document by mean "
    "token surprisal -ln p(t); keep docs at or below the threshold. "
    "At 100 TB the frequency relation is still vocabulary-sized, so "
    "the join stays broadcast; per-token terms are rounded then "
    "DECIMAL-summed so the mean is accumulation-order independent.",
)
def doc_unigram_logprob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).alias(
            "token"
        ),
    )
    freq = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("bigint").alias("n"))
    f_with_tot = freq.crossJoin(F.broadcast(tot))
    surp = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("n")), 8
    ).cast("decimal(20,8)")
    scored = (
        tok.join(F.broadcast(f_with_tot.select("token", surp.alias("surp"))), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("surp").alias("s"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(mean, 6).alias("mean_surprisal"),
        F.when(mean <= _SURPRISAL_THRESHOLD, 1).otherwise(0).alias("keep"),
    ).orderBy("doc_id")


_CLF_ORACLE = """
    WITH feats AS (
      SELECT doc_id,
             CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT)
               AS n_tokens,
             CAST(LENGTH(regexp_extract_all(LOWER(text),
                  '\\b(the|a|an|of|to|in|and|is|on|for)\\b')) AS DOUBLE)
               / GREATEST(LENGTH(regexp_extract_all(text, '\\S+')), 1)
               AS stopword_ratio
      FROM documents),
    z AS (
      SELECT doc_id, n_tokens,
             ROUND(stopword_ratio, 6) AS stopword_ratio,
             ROUND(6.0 * stopword_ratio - 0.01 * n_tokens + 0.2, 6) AS logit
      FROM feats)
    SELECT doc_id, n_tokens, stopword_ratio, logit,
           ROUND(1.0 / (1.0 + EXP(-logit)), 6) AS score,
           CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS keep
    FROM z
    ORDER BY doc_id
"""


@query(
    "doc_quality_classifier_filter",
    oracle=_CLF_ORACLE,
    doc="Model-based quality filter (fasttext-classifier stand-in): a "
    "fixed-weight linear model over scan-side features (stopword "
    "ratio, token count) with a sigmoid score and a logit>=0 keep "
    "gate. Pure column expressions in one scan — the shape a real "
    "learned filter keeps at 100 TB (weights broadcast, features "
    "computed where the data lives). Logit is rounded before the "
    "sigmoid so both engines branch identically at the boundary.",
)
def doc_quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast(
        "bigint"
    )
    stop = F.size(
        F.regexp_extract_all(
            F.lower("text"),
            F.lit(r"\b(the|a|an|of|to|in|and|is|on|for)\b"),
            F.lit(0),
        )
    ).cast("double") / F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))), F.lit(1)
    )
    feats = d.select(
        "doc_id", n_tokens.alias("n_tokens"), stop.alias("stopword_ratio_raw")
    )
    logit = F.round(
        6.0 * F.col("stopword_ratio_raw") - 0.01 * F.col("n_tokens") + 0.2, 6
    )
    z = feats.select(
        "doc_id",
        "n_tokens",
        F.round("stopword_ratio_raw", 6).alias("stopword_ratio"),
        logit.alias("logit"),
    )
    return z.select(
        "doc_id",
        "n_tokens",
        "stopword_ratio",
        "logit",
        F.round(1.0 / (1.0 + F.exp(-F.col("logit"))), 6).alias("score"),
        F.when(F.col("logit") >= 0, 1).otherwise(0).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus statistics: Zipf rank-frequency fit; bigram-LM surprisal
# ---------------------------------------------------------------------------

_ZIPF_ORACLE = """
    WITH tok AS (
      SELECT UNNEST(regexp_extract_all(text, '\\S+')) AS token
      FROM documents),
    freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
    ranked AS (
      SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
      FROM freq),
    xy AS (
      SELECT CAST(ROUND(LN(rank), 8) AS DECIMAL(20,8)) AS x,
             CAST(ROUND(LN(cnt), 8) AS DECIMAL(20,8)) AS y,
             CAST(ROUND(LN(rank) * LN(rank), 8) AS DECIMAL(20,8)) AS xx,
             CAST(ROUND(LN(rank) * LN(cnt), 8) AS DECIMAL(20,8)) AS xy
      FROM ranked),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xx) AS DOUBLE) AS sxx, CAST(SUM(xy) AS DOUBLE) AS sxy
      FROM xy)
    SELECT n AS n_vocab,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS zipf_intercept
    FROM s
"""


@query(
    "zipf_rank_frequency",
    oracle=_ZIPF_ORACLE,
    doc="Zipf's-law fit over the corpus vocabulary: least-squares slope "
    "of ln(freq) ~ ln(rank) (a healthy natural-language corpus sits "
    "near −1; a synthetic or deduplicate-starved one doesn't). The "
    "regression runs over the vocabulary-bounded frequency relation "
    "(rank window allowlisted as a bounded global window); the sums "
    "are per-term-rounded DECIMALs so the closed-form fit is "
    "accumulation-order independent.",
)
def zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _docs(spark, sf_dir)
    tok = d.select(
        F.explode(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("cnt"))
    ranked = freq.select(
        "cnt",
        F.row_number().over(W.orderBy(F.desc("cnt"), "token")).alias("rank"),
    )
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("cnt").cast("double"))
    xy = ranked.select(
        F.round(lx, 8).cast("decimal(20,8)").alias("x"),
        F.round(ly, 8).cast("decimal(20,8)").alias("y"),
        F.round(lx * lx, 8).cast("decimal(20,8)").alias("xx"),
        F.round(lx * ly, 8).cast("decimal(20,8)").alias("xy"),
    )
    s = xy.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )


_BIGRAM_ORACLE = """
    WITH arr AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
      FROM documents),
    trans AS (
      SELECT doc_id, toks[i] AS cur, toks[i + 1] AS nxt
      FROM arr, UNNEST(range(1, LENGTH(toks))) AS t(i)),
    big AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cb
      FROM trans GROUP BY cur, nxt),
    ctx AS (
      SELECT cur, CAST(COUNT(*) AS BIGINT) AS cc
      FROM trans GROUP BY cur),
    probs AS (
      SELECT b.cur, b.nxt,
             CAST(ROUND(-LN(CAST(b.cb AS DOUBLE) / c.cc), 8)
                  AS DECIMAL(20,8)) AS surp
      FROM big b JOIN ctx c ON c.cur = b.cur)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(CAST(SUM(p.surp) AS DOUBLE) / COUNT(*), 6)
             AS mean_bigram_surprisal
    FROM trans t JOIN probs p ON p.cur = t.cur AND p.nxt = t.nxt
    GROUP BY t.doc_id
    ORDER BY t.doc_id
"""


@query(
    "doc_bigram_logprob",
    oracle=_BIGRAM_ORACLE,
    doc="Bigram-LM surprisal per document: fit corpus bigram "
    "conditionals p(next|cur) = c(cur,next)/c(cur,·) (both relations "
    "vocabulary²-bounded → broadcast), score each doc by mean "
    "transition surprisal — the step up from the unigram perplexity "
    "proxy that actually penalizes shuffled/unnatural token order. "
    "Transitions come straight off the token ARRAY (index explode, no "
    "positional self-join); per-transition terms round then "
    "DECIMAL-sum.",
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    arr = d.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0)).alias("toks"),
    )
    # size==1 docs must yield NO transitions: Spark's sequence(1, 0)
    # DESCENDS ([1, 0]) rather than being empty, so gate on size first
    # (DuckDB's range(1, 1) is empty and drops them on the oracle side).
    trans = arr.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
        "toks",
    ).select(
        "doc_id",
        F.element_at("toks", F.col("i")).alias("cur"),
        F.element_at("toks", F.col("i") + 1).alias("nxt"),
    )
    big = trans.groupBy("cur", "nxt").agg(F.count("*").cast("bigint").alias("cb"))
    ctx = trans.groupBy("cur").agg(F.count("*").cast("bigint").alias("cc"))
    probs = big.join(F.broadcast(ctx), "cur").select(
        "cur",
        "nxt",
        F.round(-F.log(F.col("cb").cast("double") / F.col("cc")), 8)
        .cast("decimal(20,8)")
        .alias("surp"),
    )
    return (
        trans.join(F.broadcast(probs), ["cur", "nxt"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.round(
                F.sum("surp").cast("double") / F.count("*"), 6
            ).alias("mean_bigram_surprisal"),
        )
        .orderBy("doc_id")
    )


_JSD_ORACLE = """
    WITH tok AS (
      SELECT source, UNNEST(regexp_extract_all(text, '\\S+')) AS token
      FROM documents),
    counts AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY 1, 2),
    totals AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot FROM counts GROUP BY 1),
    vocab AS (SELECT DISTINCT token FROM counts),
    sources AS (SELECT DISTINCT source FROM counts),
    dense AS (
      SELECT s.source, v.token, COALESCE(c.cnt, 0) AS cnt, t.tot
      FROM sources s
      CROSS JOIN vocab v
      LEFT JOIN counts c ON c.source = s.source AND c.token = v.token
      JOIN totals t ON t.source = s.source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.token,
             CAST(a.cnt AS DOUBLE) / a.tot AS p,
             CAST(b.cnt AS DOUBLE) / b.tot AS q
      FROM dense a JOIN dense b
        ON a.token = b.token AND a.source < b.source),
    terms AS (
      SELECT source_a, source_b,
             CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END AS common,
             CAST(ROUND(
               0.5 * (CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2)) ELSE 0 END)
               + 0.5 * (CASE WHEN q > 0 THEN q * LN(q / ((p + q) / 2)) ELSE 0 END),
               8) AS DECIMAL(20,8)) AS term
      FROM pairs)
    SELECT source_a, source_b,
           CAST(SUM(common) AS BIGINT) AS n_common_tokens,
           CAST(SUM(term) AS DOUBLE) AS jsd_nats
    FROM terms
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
"""


@query(
    "jsd_source_divergence",
    oracle=_JSD_ORACLE,
    doc="Jensen-Shannon divergence between every pair of sources' token "
    "distributions — the domain-similarity matrix a data-mixing stage "
    "consults before setting sampling weights. All pairwise work runs "
    "on the DENSE vocabulary × source grid (both domain-bounded, "
    "zero-filled so absent tokens contribute their exact "
    "0.5·p·ln2 mass); per-token terms round then DECIMAL-sum, so the "
    "divergence is accumulation-order independent.",
)
def jsd_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select(
        "source",
        F.explode(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).alias("token"),
    )
    counts = tok.groupBy("source", "token").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    totals = counts.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("tot"))
    vocab = counts.select("token").distinct()
    sources = counts.select("source").distinct()
    dense = (
        sources.crossJoin(F.broadcast(vocab))
        .join(F.broadcast(counts), ["source", "token"], "left")
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "token",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            "tot",
        )
    )
    a = dense.alias("a")
    b = dense.alias("b")
    p = F.col("a.cnt").cast("double") / F.col("a.tot")
    q = F.col("b.cnt").cast("double") / F.col("b.tot")
    m = (p + q) / 2
    term = F.round(
        0.5 * F.when(p > 0, p * F.log(p / m)).otherwise(0.0)
        + 0.5 * F.when(q > 0, q * F.log(q / m)).otherwise(0.0),
        8,
    ).cast("decimal(20,8)")
    pairs = a.join(
        b,
        (F.col("a.token") == F.col("b.token"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.when((p > 0) & (q > 0), 1).otherwise(0).alias("common"),
        term.alias("term"),
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum("common").cast("bigint").alias("n_common_tokens"),
            F.sum("term").cast("double").alias("jsd_nats"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# BPE merge training rounds (tokenizer induction over the vocabulary)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_round_sql(r: int) -> str:
    """One BPE training round as chained CTEs: adjacent-symbol pairs
    weighted by word frequency → argmax pair (ties lexicographic) →
    apply the merge to every word's symbol sequence (space-sentinel
    replace, left-to-right non-overlapping — greedy BPE application)."""
    prev = f"v{r - 1}"
    return f"""
    p{r} AS (
      SELECT s, CAST(SUM(freq) AS BIGINT) AS w FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(ts)),
                      i -> ts[i] || ' ' || ts[i+1])) AS s
        FROM (SELECT freq, string_split(trim(seq), ' ') AS ts FROM {prev})
      ) GROUP BY s),
    b{r} AS (SELECT s, w FROM p{r} ORDER BY w DESC, s LIMIT 1),
    v{r} AS (
      SELECT tok, freq,
             replace(seq, ' ' || b.s || ' ',
                     ' ' || replace(b.s, ' ', '') || ' ') AS seq
      FROM {prev}, b{r} b)"""


_BPE_MERGE_ORACLE = (
    """
    WITH tk AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM tk GROUP BY tok),
    v0 AS (
      SELECT tok, freq,
             ' ' || array_to_string(regexp_extract_all(tok, '.'), ' ') || ' '
                 AS seq
      FROM vocab),"""
    + ",".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))
    + "\n    "
    + "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, s AS merged_pair, "
        f"replace(s, ' ', '') AS new_symbol, w AS pair_weight FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    + "\n    ORDER BY round"
)


@query(
    "bpe_merge_rounds",
    oracle=_BPE_MERGE_ORACLE,
    doc=f"BPE tokenizer-training rounds (Sennrich et al. 2016): words "
    f"split to characters, then {_BPE_ROUNDS} merge rounds — each round "
    f"counts adjacent symbol pairs weighted by corpus word frequency, "
    f"merges the heaviest pair (ties lexicographic), and rewrites every "
    f"word's symbol sequence (space-sentinel replace = greedy "
    f"left-to-right application). ALL per-round work runs on the "
    f"VOCABULARY relation (distinct words + frequencies), never the "
    f"corpus — the one corpus pass is the frequency count, so the loop "
    f"cost is Heaps-law-bounded at any corpus scale. No end-of-word "
    f"marker (simplification; the merge algebra is unchanged).",
)
def bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    vocab = (
        d.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.regexp_extract_all(F.col("tok"), F.lit("."), F.lit(0))
    v = vocab.select(
        "tok",
        "freq",
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("seq"),
    )
    out = None
    for r in range(1, _BPE_ROUNDS + 1):
        ts = F.split(F.trim(F.col("seq")), " ")
        idx = F.when(
            F.size(ts) >= 2, F.sequence(F.lit(1), F.size(ts) - 1)
        ).otherwise(F.array().cast("array<int>"))  # sequence(1,0) DESCENDS
        pairs = v.select(
            "freq",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat(
                        F.element_at(ts, i), F.lit(" "), F.element_at(ts, i + 1)
                    ),
                )
            ).alias("s"),
        )
        best = (
            pairs.groupBy("s")
            .agg(F.sum("freq").cast("bigint").alias("w"))
            .orderBy(F.desc("w"), F.asc("s"))
            .limit(1)
        )
        row = best.select(
            F.lit(r).cast("bigint").alias("round"),
            F.col("s").alias("merged_pair"),
            F.replace(F.col("s"), F.lit(" "), F.lit("")).alias("new_symbol"),
            F.col("w").alias("pair_weight"),
        )
        out = row if out is None else out.unionByName(row)
        v = v.crossJoin(F.broadcast(best.select("s"))).select(
            "tok",
            "freq",
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                F.concat(
                    F.lit(" "), F.replace(F.col("s"), F.lit(" "), F.lit("")), F.lit(" ")
                ),
            ).alias("seq"),
        )
    return out.orderBy("round")


@query(
    "token_source_concentration",
    oracle=r"""
    WITH s AS (
      SELECT source,
             CAST(SUM(LENGTH(regexp_extract_all(text, '\S+'))) AS BIGINT)
               AS toks
      FROM documents GROUP BY source),
    o AS (
      SELECT source, toks,
             ROW_NUMBER() OVER (ORDER BY toks, source) AS i
      FROM s),
    t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n FROM s)
    SELECT t.n AS n_sources, t.total AS total_tokens,
           ROUND(SUM(POWER(CAST(o.toks AS DOUBLE) / t.total, 2)), 6) AS hhi,
           ROUND(2.0 * SUM(CAST(o.i AS DOUBLE) * o.toks)
                 / (t.n * CAST(t.total AS DOUBLE))
                 - (t.n + 1.0) / t.n, 6) AS gini,
           ROUND(CAST(MAX(o.toks) AS DOUBLE) / t.total, 6) AS top_source_share
    FROM o, t
    GROUP BY t.n, t.total
    """,
    doc="Corpus-mixture concentration accounting: per-source token mass "
    "reduced to the two standard concentration indices — HHI (sum of "
    "squared shares) and the Gini coefficient (rank-weighted form over "
    "sources sorted ascending) — plus the top source's share. One "
    "corpus-scale token-count aggregate; the index arithmetic (and its "
    "rank window) runs on the |sources|-bounded relation only. The "
    "pre-flight a mixture planner runs before setting sampling weights "
    "(doc_source_weighted_sample / doc_token_budget_allocation).",
)
def token_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))).cast(
                "bigint"
            )
        ).alias("toks")
    )
    # rank window over the |sources|-bounded relation (allowlisted)
    o = s.withColumn("i", F.row_number().over(W.orderBy("toks", "source")))
    t = s.agg(
        F.sum("toks").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        o.crossJoin(F.broadcast(t))
        .groupBy("n", "total")
        .agg(
            F.round(
                F.sum(F.pow(F.col("toks").cast("double") / F.col("total"), 2)), 6
            ).alias("hhi"),
            F.round(
                2.0
                * F.sum(F.col("i").cast("double") * F.col("toks"))
                / (F.col("n") * F.col("total").cast("double"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
            F.round(F.max("toks").cast("double") / F.col("total"), 6).alias(
                "top_source_share"
            ),
        )
        .select(
            F.col("n").alias("n_sources"),
            F.col("total").alias("total_tokens"),
            "hhi",
            "gini",
            "top_source_share",
        )
    )

"""Near-duplicate detection operators for large-scale text corpora.

The reference's dedup surface is exact keep-first dedup (cleaning.py:594-595
— see operators/dedup.py); a training-data pipeline at 100 TB needs the
*near*-dup family as well. Three scale-path algorithms, all pure Column
expressions / relational plans (no Python in the hot path):

  minhash_lsh_pairs   shingle → K minhashes → banded LSH buckets →
                      candidate pairs → exact-jaccard verify.
                      Cost: one shuffle on band hash (candidate join) +
                      one broadcast-free pair verify. At 100 TB the band
                      join touches only colliding docs, never all pairs.
  simhash_pairs       per-token hash → bitwise majority signature →
                      byte-band blocking → hamming-distance verify.
                      Signature build is one explode + one groupBy (map-side
                      partial agg); blocking keeps the pair space near-linear.
  ngram_jaccard_pairs exact jaccard via inverted shingle index (explode →
                      self-join on shingle → per-pair intersection counts).
                      A document-frequency cap drops stop-shingles, the
                      classic skew guard for inverted-index joins.

Hash function: every hash is ``md5`` of a seed-prefixed string, compared /
minimized as lowercase hex VARCHAR. This is engine-portable (identical in
Spark and DuckDB), so the correctness oracle replicates the *whole*
algorithm, LSH candidate generation included, and results are exactly
reproducible — no RNG, no seed state, no platform-dependent hashing.

SimHash bit extraction from hex: bit ``b`` of a token's 32-bit hash is
``(strpos('0123456789abcdef', substr(md5, 1 + b/4, 1)) - 1) >> (b%4) & 1``
— nibble-indexed so the same expression exists in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism before CPU-heavy
    per-row work (hashing, shingling). Input splits bound scan parallelism,
    not compute parallelism: a single small parquet file arrives as ONE
    partition, which would serialize the whole signature computation; at
    cluster scale the same round-robin exchange rebalances skewed splits."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def tokens(col: Column | str) -> Column:
    """Lower-cased alphanumeric tokens (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), F.lit(0))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array; empty when < n tokens.

    Array form for small/composable use. The hot path below uses
    ``shingle_index`` instead: higher-order array lambdas run on Spark's
    interpreted expression path (no whole-stage codegen), which is an
    order of magnitude slower per element.
    """
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def token_stream(
    df: DataFrame, id_col: str, text_col: str, memo: bool = True
) -> DataFrame:
    """Positional token stream (``_id``, ``_pos``, ``_tok``) — the shared
    scan-side derivation every text-dedup family starts from (shingle
    index, simhash token counts, vocabulary relations). Memoized so a
    session tokenizes the corpus ONCE; the 100 TB analogue is
    materializing the tokenized corpus as a table per ingest, which every
    production dedup deployment does rather than re-running the tokenizer
    regex per query family."""
    def build() -> DataFrame:
        return spread(df).select(
            F.col(id_col).alias("_id"),
            F.posexplode(tokens(text_col)).alias("_pos", "_tok"),
        )

    if not memo:
        return build()
    return _memo(df, ("token_stream", id_col, text_col), build)


def shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, memo: bool = True
) -> DataFrame:
    """Distinct (``_id``, ``_g``) word-n-gram rows — the inverted-index form.

    Fully codegen'd relational plan: shared token stream → window ``lead``
    to form n-grams → distinct. One shuffle on the doc id (window) + one
    on (id, shingle) (distinct); no interpreted array lambdas. Produces
    the same shingle SET as ``word_shingles`` for every doc with ≥ n
    tokens. ``memo=False`` skips the session cache — for streaming
    micro-batches, whose one-shot relations would only churn the LRU.
    """
    def build() -> DataFrame:
        tok = token_stream(df, id_col, text_col, memo=memo)
        w = W.partitionBy("_id").orderBy("_pos")
        leads = [F.lead("_tok", j).over(w) for j in range(1, n)]
        return (
            tok.select(
                "_id",
                F.concat_ws(" ", F.col("_tok"), *leads).alias("_g"),
                leads[-1].alias("_last"),
            )
            .where(F.col("_last").isNotNull())
            .select("_id", "_g")
            .distinct()
        )

    if not memo:
        return build()
    return _memo(df, ("shingle_index", id_col, text_col, n), build)


def fingerprint_session() -> bool:
    """True only in a process that OPTED IN to plan-fingerprint mode by
    setting SPARK_GRAFT_PLAN_FINGERPRINT to its OWN pid (tools/recert.py,
    the test_entry determinism subprocess). Fingerprint processes only
    build/analyze plans, never execute them, so truncated iterative loops
    and skipped checkpoints are safe there. Pinning the value to the pid
    means an INHERITED or hand-set env var in a session that actually
    collects results fails the check and takes the normal fully-converged
    path — the variable cannot silently poison real cluster labels."""
    return os.environ.get("SPARK_GRAFT_PLAN_FINGERPRINT") == str(os.getpid())


def _materialize(df: DataFrame) -> DataFrame:
    """Materialize a small intermediate relation that the downstream plan
    references multiple times (self-joins, size lookups). Spark recomputes
    each reference of a lazy subtree — for the shingle index that means
    re-running tokenize+window 3-5×. localCheckpoint computes it once and
    truncates lineage; the relations involved are candidate-scale (≪ the
    corpus), so executor storage is bounded.

    Under SPARK_GRAFT_PLAN_FINGERPRINT (tools/recert.py) the checkpoint is
    skipped: it replaces the logical plan with an opaque LogicalRDD, which
    would hide upstream behavior changes from the re-certification
    fingerprint (the r03 simhash blocking change was invisible this way)."""
    if fingerprint_session():
        return df
    # default (deserialized) block storage: UnsafeRow-backed rows are
    # already binary, so the footprint is close to the serialized level
    # WITHOUT the java-(de)serialization per read — a measured full-bench
    # run with StorageLevel.MEMORY_AND_DISK (serialized) was 23% slower
    # end-to-end (every memoized-relation read paid row deserialization)
    return df.localCheckpoint(eager=False)


# Session-scoped memo of derived text relations (token counts, shingle
# inverted index, verified pair sets). The dedup family — minhash, simhash,
# ngram-jaccard, cluster assignment — all start from the same tokenize →
# explode → groupBy pipeline over the same corpus; without sharing, a
# 4-query run pays that scan 4×. Stored in Spark block storage
# (MEMORY_AND_DISK, via localCheckpoint — see the note inside _memo:
# checkpointing also truncates the lineage every consumer plan would
# otherwise re-analyze), keyed by (application, logical-plan semantic hash,
# derivation params), so a different corpus or different params never
# collides. This mirrors what a production deployment does at 100 TB: the
# inverted index is built once and PERSISTED as a table, not re-derived per
# query.
#
# BOUNDED: LRU of at most ``_DERIVED_CACHE_MAX`` relations; eviction
# releases the stored blocks DETERMINISTICALLY via ``_release_blocks``
# (r12, per the r11 ADVICE: ``Dataset.unpersist()`` is a CacheManager
# call and no-ops on a checkpointed plan — relying on Python GC → Py4J
# finalizer → ContextCleaner left the 32-entry bound unable to bound
# executor storage in a long-lived session), so eviction frees storage
# again exactly as it did in the cache() era. 32 covers every
# dedup/curation family over a couple of corpora at once (the r5
# additions — signature/pair memos — pushed a single-corpus
# full-registry run past the old cap of 16, which thrashed: an evicted
# pair set rebuilds at full cost).
from collections import OrderedDict

_DERIVED_CACHE: OrderedDict[tuple, DataFrame] = OrderedDict()
_DERIVED_CACHE_MAX = 32


def _release_blocks(df: DataFrame) -> None:
    """Free the executor storage behind a memoized relation NOW.

    ``Dataset.unpersist()`` only talks to the CacheManager, so for a
    localCheckpoint-backed relation (a LogicalRDD leaf over a persisted
    RDD) it is a no-op; the backing RDD is unpersisted directly off the
    analyzed plan. Blocking=False: release is fire-and-forget, eviction
    must never stall on executor round-trips."""
    try:
        df.unpersist()
    except Exception:  # pragma: no cover - session already stopped
        pass
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # pragma: no cover - session already stopped
        pass


def clear_derived_cache() -> None:
    """Unpersist and drop every memoized derived relation."""
    while _DERIVED_CACHE:
        _, df = _DERIVED_CACHE.popitem(last=False)
        _release_blocks(df)


# --- bench-only memo attribution -------------------------------------------
# Memoized relations are lazy: their build cost lands inside whichever
# query happens to consume them FIRST, so per-query bench numbers shift
# with registry order (two r7 "regressions" were exactly this artifact).
# With instrumentation ON, a memo miss materializes the cache eagerly and
# records (label, seconds); bench.py drains these per query and reports
# them as their own memo:* line items, leaving the query rows comparable
# across rounds. OFF by default — production sessions keep lazy builds.
_MEMO_EAGER = False
_MEMO_TIMINGS: list[tuple[str, float]] = []


def set_memo_instrumentation(on: bool) -> None:
    global _MEMO_EAGER
    _MEMO_EAGER = on
    _MEMO_TIMINGS.clear()


_MEMO_BUILD_DEPTH = 0  # >0 while an eager _memo build is on the stack


def record_memo_timing(label: str, seconds: float) -> None:
    """Entry point for OTHER memo layers (kmeans_lloyd's codebook memo)
    to report their build cost into the same drain. Skipped while an
    eager ``_memo`` build is on the stack: that build's own timing row
    already contains this span, and reporting both would double-count
    the seconds in the bench's memo attribution."""
    if _MEMO_EAGER and _MEMO_BUILD_DEPTH == 0:
        _MEMO_TIMINGS.append((label, seconds))


def memo_instrumentation_on() -> bool:
    return _MEMO_EAGER


def drain_memo_timings() -> list[tuple[str, float]]:
    out = list(_MEMO_TIMINGS)
    _MEMO_TIMINGS.clear()
    return out


def _memo(df: DataFrame, key_parts: tuple, build) -> DataFrame:
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df.semanticHash(),
            *key_parts,
        )
    except Exception:  # pragma: no cover - semanticHash unavailable
        return build()
    hit = _DERIVED_CACHE.get(key)
    if hit is not None:
        _DERIVED_CACHE.move_to_end(key)
        return hit
    # r11: store via localCheckpoint (through _materialize) instead of
    # .cache(). The cache kept the full logical build tree in every
    # consumer plan: the release-diff consumers analyzed 12k-line trees
    # (154 Exchange nodes printed) and paid Catalyst analysis + per-stage
    # AQE re-optimization over them on every run — 1.3-3.0 s of driver
    # time per query at sf0.1 with the data fully cached (measured, guide
    # §7.3 planning-cost symptom; §3.3 names localCheckpoint as the plan-
    # truncation tool). The checkpoint stores the same MEMORY_AND_DISK
    # blocks the cache did and replaces the consumer-visible plan with a
    # LogicalRDD leaf. Fingerprint sessions skip the truncation inside
    # _materialize, so recert still sees full lineage. In a fingerprint
    # session the relation is returned un-stored — those sessions only
    # analyze plans, never execute them.
    if _MEMO_EAGER:
        import time as _time

        global _MEMO_BUILD_DEPTH
        t0 = _time.perf_counter()
        _MEMO_BUILD_DEPTH += 1
        try:
            out = _materialize(build())
            out.count()  # populate the blocks now, on the memo's own clock
        finally:
            _MEMO_BUILD_DEPTH -= 1
        _MEMO_TIMINGS.append(
            ("/".join(str(p) for p in key_parts), _time.perf_counter() - t0)
        )
    else:
        out = _materialize(build())
    _DERIVED_CACHE[key] = out
    while len(_DERIVED_CACHE) > _DERIVED_CACHE_MAX:
        _, evicted = _DERIVED_CACHE.popitem(last=False)
        _release_blocks(evicted)
    return out


def _verify_jaccard(
    cand: DataFrame, inv: DataFrame, threshold: float
) -> DataFrame:
    """Exact jaccard for candidate (doc_a, doc_b) pairs from the inverted
    index: intersection = count of co-occurring shingles (index join
    restricted to candidate docs), union = |A| + |B| − intersection.
    All relational — no array materialization, no interpreted lambdas."""
    sizes = inv.groupBy("_id").agg(F.count("*").alias("_n"))
    inv_a = inv.join(
        cand.select(F.col("doc_a").alias("_id")).distinct(), "_id", "left_semi"
    ).select(F.col("_id").alias("doc_a"), "_g")
    inv_b = inv.join(
        cand.select(F.col("doc_b").alias("_id")).distinct(), "_id", "left_semi"
    ).select(F.col("_id").alias("doc_b"), "_g")
    inter = (
        cand.join(inv_a, "doc_a")
        .join(inv_b, ["doc_b", "_g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("doc_a"), F.col("_n").alias("_na")), "doc_a")
        .join(sizes.select(F.col("_id").alias("doc_b"), F.col("_n").alias("_nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    memo: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature relation (``_id``, ``_mh0`` .. ``_mh{k-1}``).

    Hashing cost is ONE pass over the shingle index: each shingle gets two
    56-bit md5-derived values (a, b) and the K minhash functions are the
    Kirsch–Mitzenmacher family ``h_i = a + i·b`` (no overflow:
    a + 15b < 2^60), minimized by a map-side-combined groupBy — K plain
    ``min`` aggregates over precomputed longs instead of K md5 sweeps.
    Docs with < n tokens have no shingles and are ABSENT from the result.
    Shared by the batch LSH pipeline and the streaming near-dup lane
    (streaming/neardup_stream.py), which is what makes their
    stream-equals-batch test meaningful.
    """
    def build() -> DataFrame:
        inv = shingle_index(df, id_col, text_col, n, memo=memo)
        ex = inv.withColumn(
            "_ha", _hash_int(F.md5(F.concat(F.lit("a:"), F.col("_g"))), 56)
        ).withColumn("_hb", _hash_int(F.md5(F.concat(F.lit("b:"), F.col("_g"))), 56))
        return ex.groupBy("_id").agg(
            *[F.min(F.col("_ha") + i * F.col("_hb")).alias(f"_mh{i}") for i in range(k)]
        )

    if not memo:
        return build()
    return _memo(df, ("minhash_sigs", id_col, text_col, n, k), build)


def band_rows(sig: DataFrame, k: int = 16, bands: int = 4) -> DataFrame:
    """LSH band rows (``_id``, ``_band_idx``, ``_band_hash``) from a
    signature relation — the bucket-index form candidates equi-join on.
    Pure derivation (md5 of the band's signature slice), so the streaming
    state can persist signatures only and re-derive band rows."""
    rows = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"_mh{b * rows + r}").cast("string") for r in range(rows)])
        )
        for b in range(bands)
    ]
    return sig.select("_id", F.posexplode(F.array(*band_cols)).alias("_band_idx", "_band_hash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by MinHash LSH with exact-jaccard verification.

    Returns (doc_a, doc_b, jaccard) for candidate pairs (≥1 shared LSH
    band) whose true shingle jaccard ≥ threshold, doc_a < doc_b.
    """
    def build() -> DataFrame:
        inv = shingle_index(df, id_col, text_col, n)
        sig = minhash_signatures(df, id_col, text_col, n, k)
        banded = _materialize(band_rows(sig, k, bands))

        left = banded.select(F.col("_id").alias("doc_a"), "_band_idx", "_band_hash")
        right = banded.select(F.col("_id").alias("doc_b"), "_band_idx", "_band_hash")
        cand = (
            left.join(right, ["_band_idx", "_band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        return _verify_jaccard(cand, inv, 0.0)

    # The memo key deliberately EXCLUDES the threshold: the expensive
    # part (candidates + exact-jaccard verify) is threshold-independent,
    # so every consumer — the dedup family at 0.5, the error-accounting
    # query at 0.0 — shares ONE cached base and filters it for free.
    base = _memo(df, ("minhash_pairs", id_col, text_col, n, k, bands), build)
    return base.filter(F.col("jaccard") >= threshold) if threshold > 0.0 else base


def _hash_int(md5_col: Column, nbits: int) -> Column:
    """First ``nbits``/4 hex chars of an md5 as an integer (bigint).

    nbits must be ≤ 56 so the value fits a signed 64-bit long.
    """
    return F.conv(F.substring(md5_col, 1, nbits // 4), 16, 10).cast("bigint")


def _hash_bit(h: Column, bit: int) -> Column:
    """Bit ``bit`` (0 = least significant) of an integer hash value."""
    return F.shiftright(h, bit).bitwiseAND(F.lit(1))


def simhash(df: DataFrame, id_col: str, text_col: str, nbits: int = 48) -> DataFrame:
    """Per-document SimHash signature as a ``bigint`` (``nbits`` wide).

    Plan: explode tokens → pre-aggregate to (doc, token, count) — one
    cheap map-side-combined groupBy that collapses repeated tokens BEFORE
    any hashing — then per-bit ±count partial sums in a second groupBy.
    Repeated tokens weigh by multiplicity (standard SimHash), but each
    distinct (doc, token) is hashed exactly once and the wide 48-aggregate
    stage runs over the collapsed relation (vocabulary-bounded, typically
    5–10× smaller than the raw token stream).
    """
    def build_tok() -> DataFrame:
        # derives from the SHARED memoized token stream: the tokenizer
        # regex runs once per corpus per session, not once per family
        return (
            token_stream(df, id_col, text_col)
            .groupBy("_id", "_tok")
            .agg(F.count("*").alias("_cnt"))
        )

    tok = _memo(df, ("token_counts", id_col, text_col, nbits), build_tok)
    # Packed per-bit sums. The classic formulation keeps nbits signed
    # accumulators of ±cnt; rewrite s_b = Σ±cnt = 2·p_b − total where
    # p_b = Σ(cnt·bit_b) ≥ 0 and total = Σcnt (per doc). Non-negative
    # counters pack: 3 per 64-bit long at 21-bit offsets, so the wide agg
    # runs nbits/3 + 1 sum buffers instead of nbits (48 → 17 — the agg
    # stage was the simhash bottleneck at sf0.1). Bit b lives in lane
    # b % nlanes, field b // nlanes. No field can carry into its
    # neighbour as long as every doc has < 2^21 tokens (p_b ≤ total);
    # ENFORCED below with raise_error gates at the stricter 2^20 bound
    # (which also keeps every 64-bit lane sum inside a signed long), so a
    # megatoken outlier doc fails loudly instead of silently flipping
    # unrelated signature bits — pre-chunk oversized docs before signing
    # them, standard practice before any fixed-width signature anyway.
    # Sign semantics are unchanged EXACTLY: s_b > 0  ⇔  2·p_b > total
    # (integer arithmetic throughout), so signatures are bit-identical
    # to the unpacked formulation and to the DuckDB oracle.
    #
    # The per-token lane PATTERNS (Σ_f bit_b · 2^(21f), a constant per
    # token) are pre-aggregated over the VOCABULARY relation — distinct
    # tokens, corpus-bounded and vastly smaller than the (doc, token)
    # stream — so md5+conv runs once per token, not once per (doc, token)
    # pair; a doc-token row then contributes cnt · pattern_j via one
    # multiply after an equi-join on token (AQE broadcasts the vocab side
    # when small; a shuffle hash join otherwise — never corpus × corpus).
    nlanes = (nbits + 2) // 3

    def build_vocab() -> DataFrame:
        v = tok.select("_tok").distinct().withColumn(
            "_h", _hash_int(F.md5(F.col("_tok")), nbits)
        )
        pats = []
        for j in range(nlanes):
            pat = None
            for f in range(3):
                b = j + nlanes * f
                if b >= nbits:
                    break
                term = F.shiftleft(_hash_bit(F.col("_h"), b), 21 * f)
                pat = term if pat is None else pat + term
            pats.append(pat.alias(f"_p{j}"))
        return v.select("_tok", *pats)

    vocab = _memo(df, ("simhash_vocab", id_col, text_col, nbits), build_vocab)
    # Loud overflow gates, BOTH bounding total tokens at 2^20 (the
    # conservative bound: packed-field carry needs p_b < 2^21, but the
    # 64-bit lane SUM Σ cnt·pattern needs tot < 2^20 to stay inside a
    # signed long for every pattern value). The per-row gate catches a
    # single megatoken term BEFORE the multiply could trip Spark's ANSI
    # overflow with an unactionable message; the post-agg gate catches a
    # doc whose many small counts sum past the bound.
    _OVERFLOW_MSG = (
        " exceeds 2^20 tokens; packed-lane sums would overflow "
        "— pre-chunk oversized documents before signing"
    )

    def _gated(col, limit=1 << 20):
        return F.when(col < F.lit(limit), col).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("simhash: document "),
                    F.col("_id").cast("string"),
                    F.lit(_OVERFLOW_MSG),
                )
            ).cast("bigint")
        )

    contrib = tok.join(vocab, "_tok").select(
        "_id",
        F.col("_cnt"),
        *[(_gated(F.col("_cnt")) * F.col(f"_p{j}")).alias(f"_l{j}") for j in range(nlanes)],
    )
    sums = contrib.groupBy("_id").agg(
        F.sum("_cnt").alias("_tot"),
        *[F.sum(f"_l{j}").alias(f"_l{j}") for j in range(nlanes)],
    )
    tot = _gated(F.col("_tot"))
    sig = F.lit(0).cast("bigint")
    for b in range(nbits):
        j, f = b % nlanes, b // nlanes
        p_b = F.shiftright(F.col(f"_l{j}"), 21 * f).bitwiseAND(F.lit((1 << 21) - 1))
        sig = sig + F.when(p_b * 2 > tot, F.lit(2 ** b).cast("bigint")).otherwise(0)
    return sums.select(F.col("_id").alias(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    nbits: int = 48,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Blocking: two docs within hamming d of each other on ``nbits`` bits
    must agree exactly on ≥1 of (d+1) disjoint bit-blocks (pigeonhole), so
    candidates are generated by equi-joining on block value — never by an
    all-pairs scan. Exactly d+1 blocks (the pigeonhole minimum) of
    ~nbits/(d+1) bits each: the FEWEST, WIDEST blocks the bound allows.
    Wider blocks are exponentially more selective, which is what bounds
    the Σ bucket² candidate blow-up on near-dup-heavy corpora (measured
    at sf0.1: 6×8-bit blocks → 4.1M candidates, max bucket 1338; 4×12-bit
    → 727k, max bucket 549 — a 5.7× cut at identical recall).

    The verified pair set is session-memoized (like the minhash and
    ngram builders): the standalone query, the agreement matrix, and the
    clustering query all consume the same relation, so the block join +
    hamming verify runs once per (corpus, params).
    """
    def build() -> DataFrame:
        return _simhash_pairs_build(df, id_col, text_col, nbits, max_hamming)

    return _memo(df, ("simhash_pairs", id_col, text_col, nbits, max_hamming), build)


def _simhash_pairs_build(
    df: DataFrame, id_col: str, text_col: str, nbits: int, max_hamming: int
) -> DataFrame:
    sig = simhash(df, id_col, text_col, nbits)
    nblocks = max_hamming + 1
    base_w, extra = divmod(nbits, nblocks)
    # block i covers [off_i, off_i + w_i) with the remainder bits spread
    # over the first `extra` blocks; widths differ by at most 1
    widths = [base_w + (1 if i < extra else 0) for i in range(nblocks)]
    offsets = [sum(widths[:i]) for i in range(nblocks)]
    blocked = _materialize(sig.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), offsets[i]).bitwiseAND(
                        F.lit((1 << widths[i]) - 1)
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("_block_idx", "_block_val"),
    ))
    left = blocked.select(
        F.col("_id").alias("doc_a"), F.col("simhash").alias("_sig_a"), "_block_idx", "_block_val"
    )
    right = blocked.select(
        F.col("_id").alias("doc_b"), F.col("simhash").alias("_sig_b"), "_block_idx", "_block_val"
    )
    # Hamming-verify BEFORE deduplicating: the verify is a single bitwise
    # op per candidate, while dropDuplicates is a shuffle of the whole
    # candidate set (skewed byte-blocks make that set ~1000× the final
    # pair count). Filtering first shrinks the dedup shuffle to survivors.
    return (
        left.join(right, ["_block_idx", "_block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_clusters(pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Connected components over a near-dup pair graph → (doc, cluster).

    ``cluster`` is the minimum doc id reachable through the pair graph —
    the canonical representative (keep it, drop the rest). Iterative
    min-label propagation: each round every node adopts the smallest label
    among itself and its neighbors; rounds needed = graph diameter
    (near-dup clusters are tiny, so a handful). Each round is one
    broadcast-size join — the pair set is candidate-scale, ≪ corpus scale.
    Converges by fixpoint check on an aggregate (one small action per
    round, never a row collect).
    """
    edges = _materialize(
        pairs.select(F.col(a_col).alias("_u"), F.col(b_col).alias("_v")).unionByName(
            pairs.select(F.col(b_col).alias("_u"), F.col(a_col).alias("_v"))
        ).distinct()
    )
    labels = _materialize(
        edges.select(F.col("_u").alias("_node")).distinct().withColumn("_lbl", F.col("_node"))
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges["_v"] == labels["_node"])
            .groupBy("_u")
            .agg(F.min("_lbl").alias("_nlbl"))
        )
        new_labels = _materialize(
            labels.join(neighbor_min, labels["_node"] == neighbor_min["_u"], "left")
            .select(
                "_node",
                F.least(F.col("_lbl"), F.coalesce(F.col("_nlbl"), F.col("_lbl"))).alias("_lbl"),
            )
        )
        if fingerprint_session():
            # Fingerprint lane: _materialize is a no-op here (lineage must
            # stay visible), so every extra round NESTS the full pair-
            # generation subtree again — a wide pair plan (e.g. the 48-agg
            # media simhash) blows the analyzer's heap by round 3. One
            # round exposes the complete per-round plan (pair generation,
            # neighbor-min join, label fold); the convergence rule itself
            # is covered by the fingerprint's transitive source walk.
            labels = new_labels
            break
        changed = (
            labels.alias("old")
            .join(new_labels.alias("new"), "_node")
            .filter(F.col("old._lbl") != F.col("new._lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("_node").alias("doc"), F.col("_lbl").alias("cluster"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 20,
) -> DataFrame:
    """Exact n-gram-jaccard pairs via an inverted shingle index.

    ``max_doc_freq`` drops shingles appearing in more than that many docs
    — the skew guard that keeps the index self-join from exploding on
    boilerplate shingles (Σ df² is the candidate cost; at 100 TB this is
    the difference between a linear and a quadratic stage). Jaccard is
    computed over the KEPT vocabulary (sizes counted after the cap), so
    the semantics are exact for "similarity over discriminative shingles":
    a shingle shared by more than F documents carries no near-dup signal.

    The verified pair set is session-memoized (like minhash/simhash): the
    standalone query, the containment query's sibling, and the agreement
    matrix share one build of the index self-join.
    """
    def build() -> DataFrame:
        return _ngram_jaccard_pairs_build(
            df, id_col, text_col, n, threshold, max_doc_freq
        )

    return _memo(
        df, ("ngram_pairs", id_col, text_col, n, threshold, max_doc_freq), build
    )


def prewarm_pair_memos(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    nbits: int = 48,
    max_hamming: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 20,
) -> None:
    """Materialize the three dedup pair memos (MinHash-LSH, SimHash,
    n-gram jaccard) for one corpus, overlapping the three INDEPENDENT
    builds on driver threads (optimization guide §2.6: actions are only
    sequential because the driver calls them sequentially — the
    scheduler back-fills one build's stage tail with the next build's
    tasks). The legs the three builds share (token stream, shingle
    index, minhash signatures) are materialized FIRST, sequentially:
    concurrent first materialization of a shared lazy leg serializes on
    per-block write locks while oversubscribing the cores (measured on
    the release-state writer, r11). Measured at sf0.1/32 cores: the
    cold trio 17.5 s sequential → 9.3 s (4.9 s shared legs + 4.5 s
    overlapped builds).

    No-op when all three memos are already cached (consumers call it
    unconditionally) and in fingerprint sessions (plans only, nothing
    may execute). The three builds insert DISTINCT memo keys, so the
    lock-free ``_DERIVED_CACHE`` stays correct under the overlap — the
    worst interleaving wastes a rebuild, it cannot serve a wrong
    relation. With memo instrumentation on, the three builds' timing
    rows overlap in wall time (the drained sum exceeds the true wall);
    the bench never hits that path — its warm phase runs before
    instrumentation is enabled — and micro_bench reports the rows
    per-build, which remains the honest per-relation cost."""
    if fingerprint_session():
        return
    try:
        app = df.sparkSession.sparkContext.applicationId
        h = df.semanticHash()
    except Exception:  # pragma: no cover - semanticHash unavailable
        return
    keys = [
        (app, h, "minhash_pairs", id_col, text_col, n, k, bands),
        (app, h, "simhash_pairs", id_col, text_col, nbits, max_hamming),
        (app, h, "ngram_pairs", id_col, text_col, n, threshold, max_doc_freq),
    ]
    if all(key in _DERIVED_CACHE for key in keys):
        return
    # shared legs, sequentially (each is itself memoized)
    token_stream(df, id_col, text_col).count()
    shingle_index(df, id_col, text_col, n).count()
    minhash_signatures(df, id_col, text_col, n, k).count()

    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def _mh() -> int:
        return minhash_lsh_pairs(
            df, id_col, text_col, n=n, k=k, bands=bands, threshold=threshold
        ).count()

    def _sh() -> int:
        return simhash_pairs(
            df, id_col, text_col, nbits=nbits, max_hamming=max_hamming
        ).count()

    def _ng() -> int:
        return ngram_jaccard_pairs(
            df, id_col, text_col, n=n, threshold=threshold, max_doc_freq=max_doc_freq
        ).count()

    with ThreadPoolExecutor(max_workers=3) as pool:
        futures = [pool.submit(inheritable_thread_target(f)) for f in (_mh, _sh, _ng)]
        for fut in futures:
            fut.result()


def _ngram_jaccard_pairs_build(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_doc_freq: int | None,
) -> DataFrame:
    inv = shingle_index(df, id_col, text_col, n)
    if max_doc_freq is not None:
        df_counts = inv.groupBy("_g").agg(F.count("*").alias("_df"))
        inv = _materialize(
            inv.join(
                df_counts.filter(F.col("_df") <= max_doc_freq).select("_g"), "_g", "left_semi"
            )
        )
    sizes = inv.groupBy("_id").agg(F.count("*").alias("_n"))
    shared = (
        inv.select(F.col("_id").alias("doc_a"), "_g")
        .join(inv.select(F.col("_id").alias("doc_b"), "_g"), "_g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    return (
        shared.join(sizes.select(F.col("_id").alias("doc_a"), F.col("_n").alias("_na")), "doc_a")
        .join(sizes.select(F.col("_id").alias("doc_b"), F.col("_n").alias("_nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def sig_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    min_agree: int = 8,
) -> DataFrame:
    """Near-dup pairs verified by SIGNATURE agreement — the count of
    matching minhash components (estimated jaccard = agree/k) — instead
    of exact shingle jaccard.

    This is the streaming-friendly criterion: verifying an arriving doc
    against the accepted corpus needs only the k-long signatures held in
    state, never the accepted docs' shingle sets (which would make state
    corpus-sized). Returns (doc_a, doc_b, n_agree) with doc_a < doc_b and
    n_agree >= min_agree. Same LSH banding bounds the candidate space;
    the verify is k integer equality checks per candidate.
    """
    def build() -> DataFrame:
        sig = minhash_signatures(df, id_col, text_col, n, k)
        banded = _materialize(band_rows(sig, k, bands))
        left = banded.select(F.col("_id").alias("doc_a"), "_band_idx", "_band_hash")
        right = banded.select(F.col("_id").alias("doc_b"), "_band_idx", "_band_hash")
        cand = (
            left.join(right, ["_band_idx", "_band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        return sig_verify_pairs(cand, sig, sig, k, 1)

    # Memo key excludes min_agree (same sharing rationale as
    # minhash_lsh_pairs): the greedy-keep family (min_agree=8) and the
    # estimate-error audit (min_agree=1) filter one shared base.
    base = _memo(df, ("sig_pairs", id_col, text_col, n, k, bands), build)
    return base.filter(F.col("n_agree") >= min_agree) if min_agree > 1 else base


def sig_verify_pairs(
    cand: DataFrame, sig_a: DataFrame, sig_b: DataFrame, k: int, min_agree: int
) -> DataFrame:
    """Signature-agreement verify of candidate (doc_a, doc_b) pairs:
    join each side to its signature relation, count matching components.
    Shared by the batch pair builder above and the streaming lane (where
    ``sig_b`` is the persistent accepted-signature state)."""
    sa = sig_a.select(
        F.col("_id").alias("doc_a"), *[F.col(f"_mh{i}").alias(f"_a{i}") for i in range(k)]
    )
    sb = sig_b.select(
        F.col("_id").alias("doc_b"), *[F.col(f"_mh{i}").alias(f"_b{i}") for i in range(k)]
    )
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0) for i in range(k)
    ).cast("bigint")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_agree", agree)
        .filter(F.col("n_agree") >= min_agree)
        .select("doc_a", "doc_b", "n_agree")
    )


_GREEDY_DRIVER_MAX_EDGES = 200_000
# Byte cap for the driver-lane collect: the edge cap alone is linear in id
# width (a pathological 1 KiB string id would turn 200k edges into ~400 MB
# on the driver). 32 MiB bounds the worst case regardless of id type.
_GREEDY_DRIVER_MAX_BYTES = 32 * 1024 * 1024


def _greedy_keep_driver(universe: DataFrame, edges: DataFrame, id_col: str) -> DataFrame:
    """Exact greedy-by-id maximal independent set on the driver — the
    small-graph lane of ``greedy_keep``. The collect is BOUNDED by the
    measured edge count (<= _GREEDY_DRIVER_MAX_EDGES) AND, for
    variable-width ids, measured payload bytes (<=
    _GREEDY_DRIVER_MAX_BYTES) — both checked by the caller; semantics
    are identical to the distributed fixpoint: ids in
    ascending order, keep iff no smaller kept neighbor."""
    from collections import defaultdict

    nbrs = defaultdict(list)  # node -> smaller neighbors
    nodes = set()
    for r in edges.collect():  # bounded: caller gates on n_edges
        u, v = r._u, r._v
        lo, hi = (u, v) if u < v else (v, u)
        nbrs[hi].append(lo)
        nodes.add(lo)
        nodes.add(hi)
    kept: dict = {}
    for node in sorted(nodes):
        kept[node] = not any(kept[s] for s in nbrs.get(node, ()))
    spark = universe.sparkSession
    node_type = dict(universe.select(id_col).dtypes)[id_col]
    if not kept:
        return universe.select(id_col).withColumn("kept", F.lit(True))
    # (r12 probe, kept for the record: shipping this bounded relation
    # back as a literal plan — per-element struct literals or one
    # F.lit(list) arrays_zip — was measured SLOWER than createDataFrame
    # at the ~500-3000-node sizes the driver lane sees: the per-element
    # form pays thousands of py4j calls, the array-literal form a giant
    # expression tree. createDataFrame stays.)
    status = spark.createDataFrame(
        [(n, k) for n, k in kept.items()], f"{id_col} {node_type}, kept boolean"
    )
    free = universe.select(id_col).join(
        status.select(id_col), id_col, "left_anti"
    ).withColumn("kept", F.lit(True))
    return free.unionByName(status)


def greedy_keep(universe: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Greedy-by-id maximal independent set over a near-dup pair graph:
    processing ids in ascending order, a doc is KEPT iff no smaller KEPT
    doc is its neighbor. Returns (id_col, kept boolean) for the universe.

    This is the exact batch twin of streaming accept semantics — an
    arriving doc is accepted iff it is not a near-dup of any previously
    accepted doc — when arrival order is id order. (Unlike
    connected-component canonicalization it never needs to retract an
    earlier accept when a late doc bridges two clusters, which an
    append-only stream cannot do.)

    Iterative fixpoint over GRAPH NODES ONLY (edge-free docs are kept
    outright, no iteration): each round resolves every doc whose smaller
    neighbors are all resolved — KEPT if none of them is kept, REJECTED
    if one is. Rounds = longest smaller-id dependency chain (near-dup
    clusters are clique-like, so a handful); each round is one
    candidate-scale join + aggregate, never corpus-scale. Two resolve
    rounds run between sync points (resolve is monotone, so stacking is
    free), and the iteration width adapts to the measured edge count —
    a 10k-edge graph iterates on 4 partitions instead of paying
    32-task scheduling overhead per round, while a billion-edge graph
    keeps full parallelism.
    """
    edges = _materialize(
        pairs.select(F.col("doc_a").alias("_u"), F.col("doc_b").alias("_v")).distinct()
    )
    default_parallelism = universe.sparkSession.sparkContext.defaultParallelism
    n_edges = edges.count()  # materialized above — this is a cheap cached fold
    driver_ok = n_edges <= _GREEDY_DRIVER_MAX_EDGES
    if driver_ok and n_edges > 0 and dict(edges.dtypes)["_u"] not in (
        "int", "bigint", "smallint", "tinyint"
    ):
        # Variable-width ids: the edge cap alone doesn't bound driver
        # memory, so also measure payload bytes (cached fold — cheap).
        payload = edges.agg(
            F.sum(F.length(F.col("_u").cast("string")) + F.length(F.col("_v").cast("string")))
        ).first()[0]
        driver_ok = (payload or 0) <= _GREEDY_DRIVER_MAX_BYTES
    if driver_ok:
        # Small-graph fast lane: the candidate graph (already bucketed-
        # bounded upstream) fits the driver, and the exact greedy is a
        # linear pass over sorted edges — one bounded collect replaces
        # 3+ distributed sync rounds of pure scheduling overhead. The
        # distributed fixpoint below remains the scale lane; a test pins
        # lane equivalence on the same graph
        # (tests/test_dedup_similarity.py::test_greedy_lanes_agree).
        return _greedy_keep_driver(universe, edges, id_col)
    nparts = max(4, min(default_parallelism, n_edges // 250_000 + 1))
    edges = edges.repartition(nparts)
    nodes = (
        edges.select(F.col("_u").alias(id_col))
        .unionByName(edges.select(F.col("_v").alias(id_col)))
        .distinct()
    )
    free = universe.select(id_col).join(nodes, id_col, "left_anti").withColumn(
        "kept", F.lit(True)
    )
    status = _materialize(
        nodes.withColumn("_kept", F.lit(None).cast("boolean")).repartition(nparts)
    )

    def resolve_round(st: DataFrame) -> DataFrame:
        nbr = (
            edges.join(
                st.select(F.col(id_col).alias("_u"), F.col("_kept").alias("_uk")),
                "_u",
            )
            .groupBy("_v")
            .agg(
                F.max(F.when(F.col("_uk"), 1).otherwise(0)).alias("_any_kept"),
                F.max(F.when(F.col("_uk").isNull(), 1).otherwise(0)).alias("_any_unknown"),
            )
        )
        return st.join(nbr, st[id_col] == nbr["_v"], "left").select(
            st[id_col],
            F.when(st["_kept"].isNotNull(), st["_kept"])
            .when(F.col("_any_kept") == 1, F.lit(False))
            .when(F.coalesce(F.col("_any_unknown"), F.lit(0)) == 0, F.lit(True))
            .otherwise(F.lit(None).cast("boolean"))
            .alias("_kept"),
        )

    while True:
        new_status = _materialize(resolve_round(resolve_round(status)))
        unresolved = new_status.filter(F.col("_kept").isNull()).count()
        status = new_status
        if unresolved == 0:
            break
    return free.unionByName(
        status.select(F.col(id_col), F.col("_kept").alias("kept"))
    )


def paragraph_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_tokens: int = 0,
    sep_regex: str = r"\n{2,}",
) -> DataFrame:
    """Positional paragraph stream (``_id``, ``_para_idx``, ``_ptxt``) —
    the granularity between whole-document fingerprints and duplicate
    spans that web-corpus releases (RefinedWeb/Falcon) dedup at.

    Two segmentations:
    - ``block_tokens == 0`` (default): split ``text_col`` on blank lines
      (``sep_regex``), the shape real multi-paragraph corpora use.
    - ``block_tokens = B``: non-overlapping B-token blocks off the shared
      memoized token stream — the pseudo-paragraph fallback for
      single-line corpora (the synthetic test corpus has no newlines).

    Both run fully relational (posexplode / window-free groupBy on the
    token stream); paragraph text is normalized (lower, collapsed
    whitespace) so the downstream fingerprint is layout-insensitive.
    """
    if block_tokens <= 0:
        parts = F.split(F.col(text_col), sep_regex)
        return spread(df).select(
            F.col(id_col).alias("_id"),
            F.posexplode(parts).alias("_para_idx", "_raw"),
        ).select(
            "_id",
            "_para_idx",
            F.trim(F.regexp_replace(F.lower("_raw"), r"\s+", " ")).alias("_ptxt"),
        ).filter(F.col("_ptxt") != "")
    tok = token_stream(df, id_col, text_col)
    blk = F.floor(F.col("_pos") / block_tokens).cast("long")
    return (
        tok.groupBy(F.col("_id"), blk.alias("_para_idx"))
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                    lambda s: s["_tok"],
                ),
            ).alias("_ptxt")
        )
    )

"""Near-duplicate detection queries over ``documents`` (the training-data
dedup suite: MinHash+LSH, SimHash, exact n-gram jaccard) and their DuckDB
oracles.

The oracles replicate the ENTIRE algorithm — shingling, md5-hex minhashing,
band hashing, candidate generation, verification — not just the final
filter, so the comparison certifies the LSH pipeline end-to-end. All hashes
are md5-hex (identical across engines); minhash minimization is
lexicographic on hex strings (order-isomorphic to the 128-bit integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text_dedup import (
    dedup_clusters,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..sources.catalog import load_table
from .registry import query

TOKEN_RE = "[a-z0-9]+"

# ---------------------------------------------------------------------------
# shared oracle fragments
# ---------------------------------------------------------------------------

# distinct word-3-gram shingles per doc (docs with <3 tokens excluded)
_SHINGLES_CTE = f"""
    d AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(toks) - 2, 0)),
                 i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS sh
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
            FROM documents)
      WHERE len(toks) >= 3)
"""

# Kirsch–Mitzenmacher minhash family: per-shingle 56-bit values a, b from
# two md5s; h_i = a + i·b, minimized per doc. Mirrors the Spark operator's
# single-hash-pass + groupBy-min plan.
_K, _BANDS = 16, 4
_ROWS = _K // _BANDS
_HEX56 = "CAST(CONCAT('0x', substr(md5({src}), 1, 14)) AS BIGINT)"
_MH_MINS = ",\n             ".join(
    f"MIN(ha + {i} * hb) AS mh{i}" for i in range(_K)
)
_BAND_SELECTS = "\n      UNION ALL ".join(
    "SELECT doc_id, {b} AS band_idx, md5({concat}) AS h FROM sig".format(
        b=b,
        concat=" || ',' || ".join(
            f"CAST(mh{b * _ROWS + r} AS VARCHAR)" for r in range(_ROWS)
        ),
    )
    for b in range(_BANDS)
)

_MINHASH_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    ex AS (
      SELECT doc_id,
             {_HEX56.format(src="'a:' || g")} AS ha,
             {_HEX56.format(src="'b:' || g")} AS hb
      FROM (SELECT doc_id, unnest(sh) AS g FROM d)),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM ex GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
               / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS j
      FROM cand c
      JOIN d da ON da.doc_id = c.doc_a
      JOIN d db ON db.doc_id = c.doc_b)
    SELECT doc_a, doc_b, ROUND(j, 6) AS jaccard
    FROM pairs WHERE j >= 0.5
    ORDER BY doc_a, doc_b
"""


@query(
    "minhash_lsh_dupes",
    oracle=_MINHASH_ORACLE,
    doc="MinHash(16)+LSH(4 bands) near-dup pairs with exact-jaccard verify "
    "(threshold 0.5). The oracle replicates shingling, minhashing, banding "
    "and candidate generation — full-algorithm certification.",
)
def minhash_lsh_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        minhash_lsh_pairs(d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.5)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# SimHash oracle: 48-bit signature. Spark computes the token hash as
# conv(substr(md5,1,12),16,10); the oracle decodes the same bits per hex
# nibble: bit b lives in nibble char position 12 - b//4 (big-endian hex),
# at in-nibble offset b%4.
_NBITS = 48
_BIT_SUMS = ",\n             ".join(
    "SUM((2 * ((strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1) >> {o} & 1) - 1) * cnt) AS s{b}".format(
        p=_NBITS // 4 - b // 4, o=b % 4, b=b
    )
    for b in range(_NBITS)
)
_SIG_EXPR = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_NBITS))
_BLOCK_SELECTS = "\n      UNION ALL ".join(
    f"SELECT doc_id, sig, {i} AS block_idx, (sig >> {8 * i}) & 255 AS block_val FROM sigs"
    for i in range(_NBITS // 8)
)

_SIMHASH_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS t
      FROM documents),
    h AS (SELECT doc_id, md5(t) AS hx, COUNT(*) AS cnt
          FROM tok GROUP BY doc_id, t),
    sums AS (
      SELECT doc_id,
             {_BIT_SUMS}
      FROM h GROUP BY doc_id),
    sigs AS (
      SELECT doc_id, CAST({_SIG_EXPR} AS BIGINT) AS sig FROM sums),
    blocks AS (
      {_BLOCK_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.sig AS sig_a, b.doc_id AS doc_b, b.sig AS sig_b
      FROM blocks a JOIN blocks b
        ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= 3
    ORDER BY doc_a, doc_b
"""


@query(
    "simhash_dupes",
    oracle=_SIMHASH_ORACLE,
    doc="SimHash(48-bit) near-dup pairs, byte-block LSH candidates, "
    "hamming ≤ 3. Oracle replicates the bit-majority signature exactly.",
)
def simhash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        simhash_pairs(d, "doc_id", "text", nbits=_NBITS, max_hamming=3)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# Cluster oracle: same pair generation as minhash_lsh_dupes, then
# connected components via a recursive min-label reachability CTE.
_CLUSTER_ORACLE = (
    _MINHASH_ORACLE.rsplit("SELECT doc_a", 1)[0]
    + """,
    verified AS (
      SELECT doc_a, doc_b FROM pairs WHERE j >= 0.5),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM verified
      UNION SELECT doc_b, doc_a FROM verified),
    reach AS (
      SELECT u AS node, u AS lbl FROM edges
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node)
    SELECT node AS doc, MIN(lbl) AS cluster,
           CASE WHEN node = MIN(lbl) THEN 1 ELSE 0 END AS is_representative
    FROM reach
    GROUP BY node
    ORDER BY doc
"""
).replace("WITH ", "WITH RECURSIVE ", 1)


@query(
    "neardup_cluster_assignment",
    oracle=_CLUSTER_ORACLE,
    doc="Connected components over the MinHash-LSH near-dup graph: every "
    "involved doc mapped to its cluster representative (min reachable id) "
    "— the keep/drop decision of a dedup pipeline. Spark runs iterative "
    "min-label propagation; the oracle a recursive reachability CTE.",
)
def neardup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.5)
    cl = dedup_clusters(pairs)
    return cl.select(
        "doc",
        "cluster",
        F.when(F.col("doc") == F.col("cluster"), 1).otherwise(0).alias("is_representative"),
    ).orderBy("doc")


_NGRAM_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    inv0 AS (SELECT doc_id, unnest(sh) AS g FROM d),
    kept AS (SELECT g FROM inv0 GROUP BY g HAVING COUNT(*) <= 20),
    inv AS (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN kept USING (g)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           ROUND(CAST(s.inter AS DOUBLE) / (na.n + nb.n - s.inter), 6) AS jaccard
    FROM shared s
    JOIN sizes na ON na.doc_id = s.doc_a
    JOIN sizes nb ON nb.doc_id = s.doc_b
    WHERE CAST(s.inter AS DOUBLE) / (na.n + nb.n - s.inter) >= 0.5
    ORDER BY s.doc_a, s.doc_b
"""


@query(
    "ngram_jaccard_dupes",
    oracle=_NGRAM_ORACLE,
    doc="Exact word-3-gram jaccard pairs ≥ 0.5 via inverted shingle index; "
    "document-frequency cap 20 (skew guard), jaccard over kept vocabulary.",
)
def ngram_jaccard_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=20)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# Canonical-selection oracle: cluster reachability (same recursive CTE as
# _CLUSTER_ORACLE) extended with singleton docs, then one winner per
# cluster by (longest text, lowest id).
_KEEP_CANONICAL_ORACLE = (
    _CLUSTER_ORACLE.rsplit("SELECT node", 1)[0]
    + """,
    assign AS (SELECT node AS a_doc, MIN(lbl) AS a_cluster FROM reach GROUP BY node),
    full_assign AS (
      SELECT d.doc_id, COALESCE(a.a_cluster, d.doc_id) AS cluster, d.n_chars
      FROM documents d LEFT JOIN assign a ON a.a_doc = d.doc_id),
    winners AS (
      SELECT cluster, doc_id AS canonical_id FROM (
        SELECT cluster, doc_id,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM full_assign) WHERE rn = 1)
    SELECT f.doc_id, f.cluster, w.canonical_id,
           CASE WHEN f.doc_id = w.canonical_id THEN 1 ELSE 0 END AS keep,
           f.n_chars
    FROM full_assign f JOIN winners w USING (cluster)
    ORDER BY f.doc_id
"""
)


@query(
    "doc_neardup_keep_canonical",
    oracle=_KEEP_CANONICAL_ORACLE,
    doc="End-to-end near-dup REMOVAL decision: MinHash-LSH pairs -> "
    "connected components -> one canonical doc per cluster (longest "
    "text, ties to the lowest id) -> keep/drop flag for the whole "
    "corpus (singletons keep themselves). This is the operator a "
    "curation pipeline actually runs; the winner is a keyed max_by per "
    "cluster (map-side partial), the flag a join back on the cluster "
    "id — no window over the corpus, no collect.",
)
def doc_neardup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.5)
    cl = dedup_clusters(pairs).select(
        F.col("doc").alias("doc_id"), F.col("cluster").alias("_cl")
    )
    assigned = (
        d.select("doc_id", "n_chars")
        .join(cl, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_cl"), F.col("doc_id")).alias("cluster"),
            "n_chars",
        )
    )
    winners = assigned.groupBy("cluster").agg(
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_neg"))
        ).alias("canonical_id")
    )
    return (
        assigned.join(winners, "cluster")
        .select(
            "doc_id",
            "cluster",
            "canonical_id",
            F.when(F.col("doc_id") == F.col("canonical_id"), 1)
            .otherwise(0)
            .alias("keep"),
            "n_chars",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Asymmetric containment pairs (excerpt / subset-duplicate detection)
# ---------------------------------------------------------------------------

_CONTAIN_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    inv0 AS (SELECT doc_id, unnest(sh) AS g FROM d),
    kept AS (SELECT g FROM inv0 GROUP BY g HAVING COUNT(*) <= 20),
    inv AS (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN kept USING (g)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT s.doc_a, s.doc_b,
           ROUND(CAST(s.inter AS DOUBLE) / LEAST(na.n, nb.n), 6) AS containment
    FROM shared s
    JOIN sizes na ON na.doc_id = s.doc_a
    JOIN sizes nb ON nb.doc_id = s.doc_b
    WHERE CAST(s.inter AS DOUBLE) / LEAST(na.n, nb.n) >= 0.8
    ORDER BY s.doc_a, s.doc_b
"""


@query(
    "doc_containment_pairs",
    oracle=_CONTAIN_ORACLE,
    doc="Asymmetric containment pairs: |A∩B| / min(|A|,|B|) >= 0.8 over "
    "word-3-gram shingles — catches EXCERPT duplication (a short doc "
    "fully contained in a longer one) that symmetric jaccard misses: a "
    "100-shingle quote inside a 1000-shingle article has jaccard ~0.1 "
    "but containment ~1.0. Shares the memoized df-capped inverted index "
    "with the jaccard query (one build per session); same Sigma df^2 "
    "candidate bound — only the scoring denominator changes.",
)
def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import _materialize, _memo, shingle_index

    d = load_table(spark, sf_dir, "documents")
    inv_all = shingle_index(d, "doc_id", "text", 3)

    def build() -> DataFrame:
        kept = (
            inv_all.groupBy("_g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= 20)
            .select("_g")
        )
        return _materialize(inv_all.join(kept, "_g", "left_semi"))

    inv = _memo(d, ("df_capped_index", "doc_id", "text", 3, 20), build)
    sizes = inv.groupBy("_id").agg(F.count("*").alias("_n"))
    a = inv.select(F.col("_id").alias("doc_a"), "_g")
    b = inv.select(F.col("_id").alias("doc_b"), "_g")
    shared = (
        a.join(b, "_g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    return (
        shared.join(sizes.select(F.col("_id").alias("doc_a"), F.col("_n").alias("_na")), "doc_a")
        .join(sizes.select(F.col("_id").alias("doc_b"), F.col("_n").alias("_nb")), "doc_b")
        .withColumn(
            "containment",
            F.round(
                F.col("_inter").cast("double") / F.least(F.col("_na"), F.col("_nb")), 6
            ),
        )
        .filter(F.col("containment") >= 0.8)
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Dedup-method agreement matrix (curation diagnostic)
# ---------------------------------------------------------------------------

_AGREE_ORACLE = f"""
    WITH mh AS (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) x),
    sh_ AS (SELECT doc_a, doc_b FROM ({_SIMHASH_ORACLE}) y),
    ng AS (SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) z)
    SELECT 'minhash' AS method_a, 'ngram' AS method_b,
           (SELECT COUNT(*) FROM mh) AS n_a,
           (SELECT COUNT(*) FROM ng) AS n_b,
           (SELECT COUNT(*) FROM mh JOIN ng USING (doc_a, doc_b)) AS n_common
    UNION ALL
    SELECT 'minhash', 'simhash',
           (SELECT COUNT(*) FROM mh),
           (SELECT COUNT(*) FROM sh_),
           (SELECT COUNT(*) FROM mh JOIN sh_ USING (doc_a, doc_b))
    UNION ALL
    SELECT 'ngram', 'simhash',
           (SELECT COUNT(*) FROM ng),
           (SELECT COUNT(*) FROM sh_),
           (SELECT COUNT(*) FROM ng JOIN sh_ USING (doc_a, doc_b))
    ORDER BY method_a, method_b
"""


@query(
    "dedup_method_agreement",
    oracle=_AGREE_ORACLE,
    doc="Dedup-method agreement matrix: pair-set sizes and overlaps for "
    "MinHash-LSH (jaccard >= 0.5), SimHash (hamming <= 3) and exact "
    "n-gram jaccard (>= 0.5) — the diagnostic a curation run uses to "
    "choose (and sanity-check) its dedup method: minhash ~= ngram "
    "certifies the LSH recall, simhash's divergence quantifies what a "
    "bitwise signature trades away. All three pair sets come from the "
    "session-memoized builders their standalone queries certify, so this "
    "costs three COUNT aggregates and two tiny joins on top; the oracle "
    "replicates all three full algorithms and must agree on every count.",
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        prewarm_pair_memos,
        simhash_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    # overlap the three independent pair builds when cold (guide §2.6;
    # measured 17.5 -> 9.3 s at sf0.1) — no-op once memoized
    prewarm_pair_memos(
        d, "doc_id", "text", n=3, k=_K, bands=_BANDS, nbits=48, max_hamming=3,
        threshold=0.5, max_doc_freq=20,
    )
    mh = minhash_lsh_pairs(d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    sh = simhash_pairs(d, "doc_id", "text", nbits=48, max_hamming=3).select("doc_a", "doc_b")
    ng = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=20).select(
        "doc_a", "doc_b"
    )

    def row(name_a: str, name_b: str, pa: DataFrame, pb: DataFrame) -> DataFrame:
        return (
            pa.agg(F.count("*").cast("bigint").alias("n_a"))
            .crossJoin(pb.agg(F.count("*").cast("bigint").alias("n_b")))
            .crossJoin(
                pa.join(pb, ["doc_a", "doc_b"])
                .agg(F.count("*").cast("bigint").alias("n_common"))
            )
            .select(
                F.lit(name_a).alias("method_a"),
                F.lit(name_b).alias("method_b"),
                "n_a",
                "n_b",
                "n_common",
            )
        )

    return (
        row("minhash", "ngram", mh, ng)
        .unionByName(row("minhash", "simhash", mh, sh))
        .unionByName(row("ngram", "simhash", ng, sh))
        .orderBy("method_a", "method_b")
    )


# ---------------------------------------------------------------------------
# Greedy-by-id keep (streaming accept semantics) over signature-jaccard pairs
# ---------------------------------------------------------------------------

_MIN_AGREE = 8  # of _K=16 components: estimated jaccard >= 0.5

# The greedy fixpoint unrolled as chained CTEs (same technique as the MMR
# oracle's unrolled greedy steps): round i resolves every doc whose
# smaller neighbors are all resolved. 16 rounds covers dependency chains
# far deeper than near-dup graphs produce (clique-like clusters resolve
# in 2); if a corpus ever needed more, the Spark side converges fully and
# the driver comparison would flag the divergence loudly.
_GREEDY_ROUNDS = 16


def _greedy_round_sql(i: int) -> str:
    p = f"st{i - 1}"
    # AS MATERIALIZED: each round references the previous one three times
    # (FROM + two EXISTS); inlining would be 3^16 plan blowup
    return f"""st{i} AS MATERIALIZED (
      SELECT s.id,
             CASE WHEN s.kept IS NOT NULL THEN s.kept
                  WHEN EXISTS (SELECT 1 FROM edges e JOIN {p} q ON q.id = e.u
                               WHERE e.v = s.id AND q.kept) THEN FALSE
                  WHEN NOT EXISTS (SELECT 1 FROM edges e JOIN {p} q ON q.id = e.u
                                   WHERE e.v = s.id AND q.kept IS NULL) THEN TRUE
                  ELSE NULL END AS kept
      FROM {p} s)"""


_SIG_AGREE_EXPR = " + ".join(
    f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_K)
)

_GREEDY_ROUND_CTES = ",\n    ".join(
    _greedy_round_sql(i) for i in range(1, _GREEDY_ROUNDS + 1)
)

_GREEDY_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    ex AS (
      SELECT doc_id,
             {_HEX56.format(src="'a:' || g")} AS ha,
             {_HEX56.format(src="'b:' || g")} AS hb
      FROM (SELECT doc_id, unnest(sh) AS g FROM d)),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM ex GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id),
    agree AS (
      SELECT c.doc_a, c.doc_b, ({_SIG_AGREE_EXPR}) AS n_agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b),
    edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM agree WHERE n_agree >= {_MIN_AGREE}),
    nodes AS (SELECT u AS id FROM edges UNION SELECT v AS id FROM edges),
    st0 AS MATERIALIZED (SELECT id, CAST(NULL AS BOOLEAN) AS kept FROM nodes),
    {_GREEDY_ROUND_CTES}
    SELECT e.v AS doc_id, CAST(MIN(e.u) AS BIGINT) AS blocked_by
    FROM edges e
    JOIN st{_GREEDY_ROUNDS} k ON k.id = e.u AND k.kept
    WHERE e.v IN (SELECT id FROM st{_GREEDY_ROUNDS} WHERE NOT kept)
    GROUP BY e.v
    ORDER BY doc_id
"""


@query(
    "doc_neardup_greedy_keep",
    oracle=_GREEDY_ORACLE,
    doc="Greedy-by-id near-dup rejection under SIGNATURE jaccard (>= 8/16 "
    "matching minhash components): a doc is rejected iff some smaller KEPT "
    "doc is a near-dup — exactly the accept rule the streaming near-dup "
    "lane (streaming/neardup_stream.py) applies per arriving doc, so this "
    "query is its batch twin and the stream-equals-batch test's oracle-"
    "certified side. Returns each rejected doc with its smallest kept "
    "blocker. Scale: LSH-banded candidates (never all-pairs), k integer "
    "equality checks per candidate, then an iterative fixpoint over GRAPH "
    "NODES ONLY (candidate-scale, not corpus-scale); the oracle unrolls "
    "the same fixpoint as chained CTEs.",
)
def doc_neardup_greedy_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import greedy_keep, sig_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = sig_jaccard_pairs(d, "doc_id", "text", n=3, k=_K, bands=_BANDS, min_agree=_MIN_AGREE)
    status = greedy_keep(d.select("doc_id"), pairs, "doc_id")
    kept = status.filter(F.col("kept")).select(F.col("doc_id").alias("doc_a"))
    rejected = status.filter(~F.col("kept")).select(F.col("doc_id").alias("doc_b"))
    return (
        pairs.join(kept, "doc_a", "left_semi")
        .join(rejected, "doc_b", "left_semi")
        .groupBy("doc_b")
        .agg(F.min("doc_a").alias("blocked_by"))
        .select(F.col("doc_b").alias("doc_id"), "blocked_by")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# MinHash estimate-vs-exact error accounting (sketch accuracy, like the
# ANN recall query for IVF)
# ---------------------------------------------------------------------------

_EST_ERR_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    ex AS (
      SELECT doc_id,
             {_HEX56.format(src="'a:' || g")} AS ha,
             {_HEX56.format(src="'b:' || g")} AS hb
      FROM (SELECT doc_id, unnest(sh) AS g FROM d)),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM ex GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id),
    agree AS (
      SELECT c.doc_a, c.doc_b, CAST(({_SIG_AGREE_EXPR}) AS BIGINT) AS n_agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b),
    sizes AS (SELECT doc_id, len(sh) AS n FROM d),
    g AS (SELECT doc_id, unnest(sh) AS g FROM d),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM cand c
      JOIN g ga ON ga.doc_id = c.doc_a
      JOIN g gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
      GROUP BY 1, 2),
    pairs AS (
      SELECT a2.doc_a, a2.doc_b, a2.n_agree,
             ROUND(CAST(a2.n_agree AS DOUBLE) / {_K}, 6) AS est_jaccard,
             ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
                   / (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS exact_jaccard
      FROM agree a2
      LEFT JOIN inter i ON i.doc_a = a2.doc_a AND i.doc_b = a2.doc_b
      JOIN sizes sa ON sa.doc_id = a2.doc_a
      JOIN sizes sb ON sb.doc_id = a2.doc_b),
    terms AS (
      SELECT doc_a, doc_b, n_agree, est_jaccard, exact_jaccard,
             ROUND(ABS(est_jaccard - exact_jaccard), 6) AS abs_err
      FROM pairs)
    SELECT doc_a, doc_b, n_agree, est_jaccard, exact_jaccard, abs_err
    FROM terms
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(COUNT(*) AS BIGINT), 0.0, 0.0,
           ROUND(CAST(SUM(CAST(abs_err AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6)
    FROM terms
    ORDER BY doc_a, doc_b
"""


@query(
    "minhash_estimate_error",
    oracle=_EST_ERR_ORACLE,
    doc=f"Sketch-accuracy accounting for MinHash (the text twin of "
    f"emb_ivf_recall_at10): every banded candidate pair's signature-"
    f"estimated jaccard (n_agree/{_K}) against its EXACT shingle "
    f"jaccard, with a mean-absolute-error summary row (doc_a = -1, "
    f"DECIMAL-summed). Exact verification touches only banded "
    f"candidates via the inverted index — the same Σ bucket² bound as "
    f"the dedup path; signatures, bands, and the index all ride the "
    f"session memos, so this audit is nearly free after any dedup "
    f"query has run.",
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import minhash_lsh_pairs, sig_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    agree = sig_jaccard_pairs(
        d, "doc_id", "text", n=3, k=_K, bands=_BANDS, min_agree=1
    )
    exact = minhash_lsh_pairs(
        d, "doc_id", "text", n=3, k=_K, bands=_BANDS, threshold=0.0
    )
    est = F.round(F.col("n_agree").cast("double") / _K, 6)
    pairs = (
        agree.join(exact, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_agree").cast("bigint").alias("n_agree"),
            est.alias("est_jaccard"),
            F.round(F.coalesce(F.col("jaccard"), F.lit(0.0)), 6).alias(
                "exact_jaccard"
            ),
        )
        .withColumn(
            "abs_err",
            F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6),
        )
    )
    summary = pairs.agg(
        F.lit(-1).cast("bigint").alias("doc_a"),
        F.lit(-1).cast("bigint").alias("doc_b"),
        F.count("*").cast("bigint").alias("n_agree"),
        F.lit(0.0).alias("est_jaccard"),
        F.lit(0.0).alias("exact_jaccard"),
        F.round(
            F.sum(F.col("abs_err").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("abs_err"),
    )
    return pairs.unionByName(summary).orderBy("doc_a", "doc_b")


_DUP_BY_SOURCE_ORACLE = """
    WITH fp AS (
      SELECT doc_id, source,
             MD5(SUBSTR(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g'),
                        1, 64)) AS f
      FROM documents),
    g AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS cnt,
             MIN(doc_id) AS keeper,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM fp GROUP BY f)
    SELECT fp.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN g.cnt > 1 AND fp.doc_id <> g.keeper
                           THEN 1 END) AS BIGINT) AS n_dup_rows,
           CAST(COUNT(CASE WHEN g.n_sources > 1 THEN 1 END) AS BIGINT)
             AS n_cross_source,
           ROUND(CAST(COUNT(CASE WHEN g.cnt > 1 AND fp.doc_id <> g.keeper
                                 THEN 1 END) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate
    FROM fp JOIN g ON g.f = fp.f
    GROUP BY fp.source
    ORDER BY fp.source
"""


@query(
    "doc_dedup_rate_by_source",
    oracle=_DUP_BY_SOURCE_ORACLE,
    doc="Per-source dedup accounting: exact-dup row rate (non-keeper "
    "docs under min-id-keeps semantics) and cross-source contamination "
    "(docs whose fingerprint also appears in another source) — the "
    "table a curation run publishes to decide which sources are worth "
    "their ingest cost. One shuffle on the 16-byte fingerprint, group "
    "stats joined back, one bounded per-source rollup.",
)
def doc_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    f = F.md5(
        F.substring(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 1, 64)
    )
    fp = d.select("doc_id", "source", f.alias("f"))
    g = fp.groupBy("f").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.min("doc_id").alias("keeper"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
    )
    is_dup_row = (F.col("cnt") > 1) & (F.col("doc_id") != F.col("keeper"))
    return (
        fp.join(g, "f")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_if(is_dup_row).cast("bigint").alias("n_dup_rows"),
            F.count_if(F.col("n_sources") > 1).cast("bigint").alias("n_cross_source"),
            F.round(
                F.count_if(is_dup_row).cast("double") / F.count("*"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


_DEGREE_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    ex AS (
      SELECT doc_id,
             {_HEX56.format(src="'a:' || g")} AS ha,
             {_HEX56.format(src="'b:' || g")} AS hb
      FROM (SELECT doc_id, unnest(sh) AS g FROM d)),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM ex GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.h = b.h AND a.doc_id < b.doc_id),
    edges AS (
      SELECT c.doc_a AS u, c.doc_b AS v
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
      WHERE ({_SIG_AGREE_EXPR}) >= {_MIN_AGREE}),
    ends AS (SELECT u AS id FROM edges UNION ALL SELECT v FROM edges),
    deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM ends GROUP BY id),
    zero AS (
      SELECT CAST(0 AS BIGINT) AS degree,
             CAST((SELECT COUNT(*) FROM documents)
                  - (SELECT COUNT(*) FROM deg) AS BIGINT) AS n_docs)
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    UNION ALL
    SELECT degree, n_docs FROM zero
    ORDER BY degree
"""


@query(
    "neardup_degree_distribution",
    oracle=_DEGREE_ORACLE,
    doc=f"Degree distribution of the signature-verified near-dup graph "
    f"(n_agree >= {_MIN_AGREE}) including the degree-0 mass — the "
    f"graph-health profile a dedup deployment monitors (a fattening "
    f"high-degree tail means template spam or a broken shingle "
    f"normalizer). All work after the memoized pair base is "
    f"candidate-scale: one union + two bounded aggregates.",
)
def neardup_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import sig_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = sig_jaccard_pairs(
        d, "doc_id", "text", n=3, k=_K, bands=_BANDS, min_agree=_MIN_AGREE
    )
    ends = pairs.select(F.col("doc_a").alias("id")).unionAll(
        pairs.select(F.col("doc_b").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count("*").cast("bigint").alias("degree"))
    dist = deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_docs"))
    totals = d.agg(F.count("*").cast("bigint").alias("n_total")).crossJoin(
        F.broadcast(deg.agg(F.count("*").cast("bigint").alias("n_nodes")))
    )
    zero = totals.select(
        F.lit(0).cast("bigint").alias("degree"),
        (F.col("n_total") - F.col("n_nodes")).cast("bigint").alias("n_docs"),
    )
    return dist.unionByName(zero).orderBy("degree")


_SOURCE_MATRIX_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    inv0 AS (SELECT doc_id, unnest(sh) AS g FROM d),
    kept AS (SELECT g FROM inv0 GROUP BY g HAVING COUNT(*) <= 20),
    inv AS (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN kept USING (g)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT s.doc_a, s.doc_b
      FROM shared s
      JOIN sizes na ON na.doc_id = s.doc_a
      JOIN sizes nb ON nb.doc_id = s.doc_b
      WHERE CAST(s.inter AS DOUBLE) / (na.n + nb.n - s.inter) >= 0.5),
    labeled AS (
      SELECT LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b)
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CASE WHEN source_a = source_b THEN 0 ELSE 1 END AS cross_source
    FROM labeled
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
"""


@query(
    "neardup_source_matrix",
    oracle=_SOURCE_MATRIX_ORACLE,
    doc="Cross-source near-dup matrix (content-syndication accounting): "
    "exact word-3-gram jaccard >= 0.5 pairs labeled with their docs' "
    "sources (unordered pair normalized LEAST/GREATEST), counted per "
    "source pair with a cross-source flag — which sources copy from "
    "which, the signal for source-level dedup priorities. Reuses the "
    "memoized df-capped pair base (no new corpus scan); the source "
    "join touches only pair ids, so the matrix is candidate-scale.",
)
def neardup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=20)
    src = d.select("doc_id", "source")
    labeled = (
        pairs.select("doc_a", "doc_b")
        .join(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "_sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "_sb"), "doc_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
    )
    return (
        labeled.groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            F.when(F.col("source_a") == F.col("source_b"), 0).otherwise(1).alias("cross_source"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# LSH band-parameter tuning: the (bands, rows) S-curve sweep
# ---------------------------------------------------------------------------


def _band_tuning_cfg_sql(bands: int) -> str:
    rows = _K // bands
    band_sel = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS h FROM sig".format(
            b=b,
            concat=" || ',' || ".join(
                f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(_K)
    )
    return f"""
    SELECT {bands} AS bands, {rows} AS rows_per_band,
           ROUND(POWER(1.0 / {bands}, 1.0 / {rows}), 4) AS s_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           ROUND(CAST(SUM(n_agree) AS DOUBLE) / ({_K} * COUNT(*)), 6)
             AS mean_est_jaccard,
           CAST(SUM(CASE WHEN n_agree * 2 >= {_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_est_ge_half
    FROM (
      SELECT c.doc_a, c.doc_b, ({agree}) AS n_agree
      FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ({band_sel}) a
            JOIN ({band_sel}) b
              ON a.band_idx = b.band_idx AND a.h = b.h
             AND a.doc_id < b.doc_id) c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b)"""


_BAND_TUNING_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    ex AS (
      SELECT doc_id,
             {_HEX56.format(src="'a:' || g")} AS ha,
             {_HEX56.format(src="'b:' || g")} AS hb
      FROM (SELECT doc_id, unnest(sh) AS g FROM d)),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM ex GROUP BY doc_id)
    {" UNION ALL ".join(_band_tuning_cfg_sql(b) for b in (16, 8, 4, 2))}
    ORDER BY bands DESC
"""


@query(
    "lsh_band_tuning",
    oracle=_BAND_TUNING_ORACLE,
    doc=f"LSH parameter sweep over (bands, rows-per-band) splits of the "
    f"SAME {_K}-hash MinHash signatures — the S-curve tuning table a "
    f"dedup pipeline consults before committing to a banding: per config, "
    f"the candidate-pair volume, the theoretical 50%-detection threshold "
    f"(1/b)^(1/r), the mean signature-estimated jaccard of candidates, "
    f"and how many clear 0.5. Signatures are computed once (session "
    f"memo, shared with the dedup family); each config re-bands those "
    f"{_K} integers and equi-joins its buckets — candidates stay "
    f"Σ bucket² bounded, never all-pairs.",
)
def lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import band_rows, minhash_signatures

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d, "doc_id", "text", n=3, k=_K)
    # A config's candidates are pairs agreeing on ALL r hashes of some
    # aligned band — which implies agreeing on each single hash in it, so
    # every coarser config's candidate set is a SUBSET of the bands=_K
    # (rows=1) set. Build that superset ONCE (one band self-join instead
    # of four), attach both signatures ONCE (two joins instead of eight),
    # derive per-config membership from the per-hash equality bits, and
    # aggregate all four configs in one grouped pass (optimization guide
    # §2.4: shared exchanges / duplicate subtrees removed). Results are
    # identical: band buckets key on md5 of the comma-joined values — an
    # injective encoding, so bucket equality IS value-tuple equality.
    banded = band_rows(sig, _K, _K)
    left = banded.select(F.col("_id").alias("doc_a"), "_band_idx", "_band_hash")
    right = banded.select(F.col("_id").alias("doc_b"), "_band_idx", "_band_hash")
    cand = (
        left.join(right, ["_band_idx", "_band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(
        F.col("_id").alias("doc_a"), *[F.col(f"_mh{i}").alias(f"a{i}") for i in range(_K)]
    )
    sb = sig.select(
        F.col("_id").alias("doc_b"), *[F.col(f"_mh{i}").alias(f"b{i}") for i in range(_K)]
    )
    eq = [F.col(f"a{i}") == F.col(f"b{i}") for i in range(_K)]
    n_agree = sum(F.when(eq[i], 1).otherwise(0) for i in range(_K))

    def member(bands: int):
        rows = _K // bands
        block = None
        for b in range(bands):
            conj = eq[b * rows]
            for r in range(1, rows):
                conj = conj & eq[b * rows + r]
            block = conj if block is None else block | conj
        return block

    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            n_agree.alias("n_agree"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bands).alias("bands"),
                            member(bands).alias("m"),
                        )
                        for bands in (16, 8, 4, 2)
                    ]
                )
            ).alias("cfg"),
        )
        .filter(F.col("cfg.m"))
        .select(F.col("cfg.bands").alias("bands"), "n_agree")
    )
    grouped = pairs.groupBy("bands").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
        F.sum("n_agree").alias("_sum_agree"),
        F.sum(F.when(F.col("n_agree") * 2 >= _K, 1).otherwise(0))
        .cast("bigint")
        .alias("_ge_half"),
    )
    # 4-row config spine (same literal expressions as before, so the
    # s_threshold doubles round identically); left join keeps a config
    # with zero candidates as (0, NULL, NULL) — the empty-input global
    # aggregate's row in the previous per-config form
    spine = None
    for bands in (16, 8, 4, 2):
        rows = _K // bands
        row = spark.range(1).select(
            F.lit(bands).alias("bands"),
            F.lit(rows).alias("rows_per_band"),
            F.round(F.pow(F.lit(1.0 / bands), 1.0 / rows), 4).alias("s_threshold"),
        )
        spine = row if spine is None else spine.unionByName(row)
    return (
        spine.join(F.broadcast(grouped), "bands", "left")
        .select(
            "bands",
            "rows_per_band",
            "s_threshold",
            F.coalesce(F.col("_cnt"), F.lit(0).cast("bigint")).alias(
                "n_candidates"
            ),
            F.round(
                F.col("_sum_agree").cast("double") / (_K * F.col("_cnt")), 6
            ).alias("mean_est_jaccard"),
            F.col("_ge_half").alias("n_est_ge_half"),
        )
        .orderBy(F.desc("bands"))
    )


# ---------------------------------------------------------------------------
# paragraph-level dedup (RefinedWeb/Falcon granularity)
# ---------------------------------------------------------------------------

_PARA_B = 16

_PARA_DEDUP_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
      FROM documents),
    t AS (
      SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
      FROM tk),
    p AS (
      SELECT doc_id, pos // {_PARA_B} AS para_idx,
             string_agg(tok, ' ' ORDER BY pos) AS ptxt
      FROM t GROUP BY doc_id, pos // {_PARA_B}),
    r AS (
      SELECT doc_id, para_idx,
             ROW_NUMBER() OVER (PARTITION BY md5(ptxt)
                                ORDER BY doc_id, para_idx) AS rn
      FROM p)
    SELECT doc_id,
           COUNT(*) AS n_paragraphs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           ROUND(CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS surviving_ratio
    FROM r GROUP BY doc_id
    ORDER BY doc_id
"""


@query(
    "doc_paragraph_dedup",
    oracle=_PARA_DEDUP_ORACLE,
    doc="Paragraph-level exact dedup — the RefinedWeb/Falcon granularity "
    "between whole-doc fingerprints and duplicate spans: segment every "
    "doc into paragraphs (16-token pseudo-paragraph blocks here — the "
    "synthetic corpus is single-line; operators/text_dedup.py::"
    "paragraph_stream splits real corpora on blank lines with the same "
    "downstream plan), md5-fingerprint each, keep the first occurrence "
    "per fingerprint corpus-wide (min doc_id then paragraph position), "
    "report per-doc paragraph counts and surviving ratio. One shuffle on "
    "the fingerprint (the keep-first window), one on doc_id (the per-doc "
    "rollup) — at 100 TB both key on high-cardinality hashes with no "
    "skew, and the paragraph relation is strictly smaller than the token "
    "stream it derives from.",
)
def doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.text_dedup import paragraph_stream

    d = load_table(spark, sf_dir, "documents")
    p = paragraph_stream(d, "doc_id", "text", block_tokens=_PARA_B)
    w = W.partitionBy(F.md5("_ptxt")).orderBy("_id", "_para_idx")
    r = p.withColumn("rn", F.row_number().over(w))
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
    return (
        r.groupBy(F.col("_id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_paragraphs"),
            kept.alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_removed"),
            F.round(kept.cast("double") / F.count("*"), 6).alias(
                "surviving_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# LSH bucket-occupancy histogram: the shuffle-skew diagnostic
# ---------------------------------------------------------------------------

_BUCKET_OCC_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    ex AS (
      SELECT doc_id,
             {_HEX56.format(src="'a:' || g")} AS ha,
             {_HEX56.format(src="'b:' || g")} AS hb
      FROM (SELECT doc_id, unnest(sh) AS g FROM d)),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM ex GROUP BY doc_id),
    bands AS (
      {_BAND_SELECTS}),
    bk AS (
      SELECT band_idx, h, COUNT(*) AS sz
      FROM bands GROUP BY band_idx, h)
    SELECT band_idx,
           CAST(sz AS BIGINT) AS bucket_size,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(COUNT(*) * sz * (sz - 1) / 2 AS BIGINT) AS candidate_pairs
    FROM bk GROUP BY band_idx, sz
    ORDER BY band_idx, bucket_size
"""


@query(
    "lsh_bucket_occupancy",
    oracle=_BUCKET_OCC_ORACLE,
    doc=f"LSH bucket-occupancy histogram for the production MinHash({_K})/"
    f"{_BANDS}-band index — THE diagnostic that decides whether the "
    f"candidate join survives a 100 TB corpus: per (band, bucket-size) "
    f"the number of buckets at that size and the candidate pairs they "
    f"contribute (size*(size-1)/2 each; Σ over the histogram IS the "
    f"join's output volume, the quantity the text lane's widest-block "
    f"discipline at operators/text_dedup.py and the r8 media SimHash "
    f"redesign both minimize). A heavy tail here means the band hash is "
    f"under-discriminating (rows-per-band too small) and the equi-join "
    f"degenerates toward all-pairs inside hot buckets. Two shuffles "
    f"total, both on hash keys (bucket count, then size rollup); rides "
    f"the session-memoized signature relation shared with the dedup "
    f"family, so the marginal cost is the bucket groupBy alone.",
)
def lsh_bucket_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_dedup import band_rows, minhash_signatures

    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d, "doc_id", "text", n=3, k=_K)
    bk = band_rows(sig, _K, _BANDS).groupBy("_band_idx", "_band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        bk.groupBy(F.col("_band_idx").alias("band_idx"), "sz")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .select(
            "band_idx",
            F.col("sz").cast("bigint").alias("bucket_size"),
            F.col("n_buckets").cast("bigint"),
            (F.col("n_buckets") * F.col("sz") * (F.col("sz") - 1) / 2)
            .cast("bigint")
            .alias("candidate_pairs"),
        )
        .orderBy("band_idx", "bucket_size")
    )

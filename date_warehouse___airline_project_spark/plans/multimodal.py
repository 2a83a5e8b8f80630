"""Multimodal plumbing query: binary media columns + Arrow-batched
metadata extraction (operators/multimodal.py), oracle-checked.

The payloads are deterministic (UTF-8 bytes of ``documents.text``), so the
DuckDB oracle reproduces the mapInPandas output exactly: DuckDB's
``md5(VARCHAR)`` hashes the UTF-8 encoding — the same bytes Python's
hashlib sees — and the fake width/height decode the first two digest
bytes on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_media, extract_media_meta
from ..sources.catalog import load_table
from .registry import query


def _hexbyte(col: str, pos: int) -> str:
    """SQL: byte at hex-string position ``pos`` (1-based, 2 chars) as int."""
    hx = "0123456789abcdef"
    return (
        f"(strpos('{hx}', substr({col}, {pos}, 1)) - 1) * 16"
        f" + (strpos('{hx}', substr({col}, {pos + 1}, 1)) - 1)"
    )


_MEDIA_ORACLE = f"""
    WITH m AS (SELECT doc_id, md5(text) AS h, text FROM documents)
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           h AS content_md5,
           CAST(64 + {_hexbyte('h', 1)} AS INT) AS width,
           CAST(64 + {_hexbyte('h', 3)} AS INT) AS height
    FROM m
    ORDER BY media_id
"""


@query(
    "media_meta_extract",
    oracle=_MEDIA_ORACLE,
    doc="Binary media column → Arrow-batched mapInPandas metadata extraction "
    "(bytes, md5, hash-derived fake dimensions — decode stubbed, plumbing real).",
)
def media_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    return extract_media_meta(media).orderBy("media_id")


_FRAMES_ORACLE = """
    WITH v AS (
      SELECT doc_id, text, octet_length(encode(text)) AS nb
      FROM documents WHERE doc_id % 3 = 2),
    f AS (
      SELECT doc_id, t.i AS frame_idx,
             SUBSTR(text, t.i * 1024 + 1, 1024) AS frame_text
      FROM v, UNNEST(GENERATE_SERIES(0,
                 LEAST(4, GREATEST(1, nb // 1024)) - 1)) AS t(i))
    SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(octet_length(encode(frame_text)) AS BIGINT) AS frame_len,
           MD5(frame_text) AS frame_md5
    FROM f
    ORDER BY media_id, frame_idx
"""


@query(
    "media_frame_fanout",
    oracle=_FRAMES_ORACLE,
    doc="Frame-sampling fan-out (operators/multimodal.py::sample_frames): "
    "one video row → ≤4 frame rows via an Arrow-batched mapInPandas "
    "GENERATOR (output rows ≢ input rows — the shape a real keyframe "
    "extractor needs). Payloads are ASCII so the DuckDB oracle replicates "
    "the byte slicing with SUBSTR and hashes identical bytes.",
)
def media_frame_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    frames = sample_frames(media, frame_size=1024, max_frames=4)
    return (
        frames.select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.length("frame_bytes").cast("bigint").alias("frame_len"),
            F.md5("frame_bytes").alias("frame_md5"),
        )
        .orderBy("media_id", "frame_idx")
    )


_RESIZE_TARGET = (32 * 32) // 64  # 16 bytes

_RESIZE_ORACLE = f"""
    WITH img AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
    t AS (
      SELECT doc_id,
             rpad(substr(text, 1, {_RESIZE_TARGET}), {_RESIZE_TARGET}, '.') AS thumb
      FROM img)
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS width,
           CAST(32 AS INT) AS height,
           CAST(octet_length(encode(thumb)) AS BIGINT) AS thumb_len,
           md5(thumb) AS thumb_md5
    FROM t
    ORDER BY media_id
"""


@query(
    "media_resize_thumbnails",
    oracle=_RESIZE_ORACLE,
    doc="Resize/resample plumbing (operators/multimodal.py::resize_media): "
    "image rows -> FIXED-width thumbnail payloads via Arrow-batched "
    "mapInPandas — the fixed-output-size contract that keeps a resize "
    "stage's partitioning uniform at 100 TB (no long tail of huge blobs "
    "downstream). Codec stubbed; the fake truncate/pad resample is "
    "byte-replicated by the oracle (ASCII payloads, SUBSTR+RPAD).",
)
def media_resize_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents")
    thumbs = resize_media(attach_media(docs), 32, 32)
    return (
        thumbs.select(
            "media_id",
            "width",
            "height",
            F.length("thumb_bytes").cast("bigint").alias("thumb_len"),
            F.md5("thumb_bytes").alias("thumb_md5"),
        )
        .orderBy("media_id")
    )


def _hexbyte_list(col: str, dims: int) -> str:
    return "list_value(" + ", ".join(
        f"CAST({_hexbyte(col, 2 * i + 1)} AS DOUBLE)" for i in range(dims)
    ) + ")"


_EMBED_ORACLE = f"""
    WITH e AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             {_hexbyte_list('md5(text)', 8)} AS v
      FROM documents),
    q AS (SELECT v AS qv FROM e WHERE media_id = 0)
    SELECT e.media_id, e.media_type,
           ROUND(list_dot_product(e.v, q.qv)
                 / (SQRT(list_dot_product(e.v, e.v))
                    * SQRT(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
    FROM e, q
    WHERE e.media_id <> 0
    ORDER BY cos_sim DESC, e.media_id
    LIMIT 10
"""


@query(
    "media_embedding_topk",
    oracle=_EMBED_ORACLE,
    doc="Feature-extraction bridge (operators/multimodal.py::embed_media): "
    "media rows -> dense array<double> embeddings via Arrow-batched "
    "mapInPandas (encoder stubbed; digest-derived fake vectors), then "
    "straight into the shared cosine top-k machinery — the media -> "
    "embedding -> similarity composition a multimodal curation pipeline "
    "runs. Query vector broadcast, fold stays in the plan, integer-valued "
    "doubles keep both engines bit-identical.",
)
def media_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import embed_media
    from ..operators.similarity import cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = embed_media(attach_media(docs), dims=8)
    q = emb.filter(F.col("media_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("media_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "media_id",
            "media_type",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "media_id")
        .limit(10)
    )


_MEDIA_DEDUP_ORACLE = """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             md5(text) AS content_md5,
             octet_length(encode(text)) AS nb
      FROM m0),
    g AS (
      SELECT media_type, content_md5,
             COUNT(*) AS n_copies, MIN(nb) AS nb
      FROM m GROUP BY media_type, content_md5)
    SELECT media_type,
           CAST(SUM(n_copies) AS BIGINT) AS n_blobs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           CAST(SUM((n_copies - 1) * nb) AS BIGINT) AS wasted_bytes
    FROM g
    GROUP BY media_type
    ORDER BY media_type
""".replace("FROM m0", "FROM documents")


@query(
    "media_exact_dedup",
    oracle=_MEDIA_DEDUP_ORACLE,
    doc="Exact media-blob dedup accounting: md5 over the BINARY content "
    "column (JVM-side, no Python stage - the digest never needs a "
    "decode), hash-groupBy per (media_type, digest), then a per-type "
    "summary: blob count, distinct count, duplicate groups, reclaimable "
    "bytes. The blob dedup every multimodal ingest runs before storage; "
    "one shuffle on a 16-byte key at any corpus scale, 3-row output.",
)
def media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    media = attach_media(load_table(spark, sf_dir, "documents"))
    groups = (
        media.select(
            "media_id",
            "media_type",
            F.md5(F.col("content")).alias("content_md5"),
            F.length(F.col("content")).alias("nb"),
        )
        .groupBy("media_type", "content_md5")
        .agg(F.count("*").alias("n_copies"), F.min("nb").alias("nb"))
    )
    return (
        groups.groupBy("media_type")
        .agg(
            F.sum("n_copies").cast("bigint").alias("n_blobs"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_groups"),
            F.sum((F.col("n_copies") - 1) * F.col("nb"))
            .cast("bigint")
            .alias("wasted_bytes"),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# binary fuzzy fingerprint near-dup (ssdeep/TLSH-shaped, no decode)
# ---------------------------------------------------------------------------

_MF_NBITS = 96  # two 48-bit signature words -> 6x16-bit pigeonhole blocks
_MF_HAM = 5
_MF_NBLOCKS = _MF_HAM + 1
_MF_WIDTH = _MF_NBITS // _MF_NBLOCKS
# bit b lives in word b//48 at local bit b%48; word w = md5 hex chars
# 12w+1 .. 12w+12, most-significant char first (matches conv(..., 16, 10))
_MF_BIT_SUMS = ",\n             ".join(
    "SUM((2 * ((strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1) >> {o} & 1) - 1)"
    " * cnt) AS s{b}".format(
        p=12 * (b // 48) + 12 - (b % 48) // 4, o=b % 4, b=b
    )
    for b in range(_MF_NBITS)
)
_MF_SIG_EXPRS = ",\n             ".join(
    "CAST("
    + " + ".join(
        f"(CASE WHEN s{48 * w + lb} > 0 THEN {1 << lb} ELSE 0 END)"
        for lb in range(min(48, _MF_NBITS - 48 * w))
    )
    + f" AS BIGINT) AS sig{w}"
    for w in range((_MF_NBITS + 47) // 48)
)
_MF_BLOCK_SELECTS = "\n      UNION ALL ".join(
    f"SELECT media_id, sig0, sig1, {i} AS bi, "
    f"(sig{(i * _MF_WIDTH) // 48} >> {(i * _MF_WIDTH) % 48}) "
    f"& {(1 << _MF_WIDTH) - 1} AS bv FROM sigs"
    for i in range(_MF_NBLOCKS)
)
_MF_HAM_SQL = (
    "(bit_count(xor(sa0, sb0)) + bit_count(xor(sa1, sb1)))"
)

_MEDIA_FUZZY_ORACLE = f"""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS content FROM documents),
    hb AS (
      SELECT media_id, lower(hex(content)) AS h,
             octet_length(content) AS nb
      FROM media),
    g AS (
      SELECT media_id, substr(h, pos * 2 + 1, 8) AS gram
      FROM hb, unnest(range(0, greatest(nb - 3, 0))) t(pos)
      WHERE nb >= 4),
    hc AS (
      SELECT media_id, md5(gram) AS hx, COUNT(*) AS cnt
      FROM g GROUP BY media_id, gram),
    sums AS (
      SELECT media_id,
             {_MF_BIT_SUMS}
      FROM hc GROUP BY media_id),
    sigs AS (SELECT media_id,
             {_MF_SIG_EXPRS}
             FROM sums),
    blocks AS (
      {_MF_BLOCK_SELECTS}),
    cand AS (
      SELECT DISTINCT a.media_id AS media_a, a.sig0 AS sa0, a.sig1 AS sa1,
                      b.media_id AS media_b, b.sig0 AS sb0, b.sig1 AS sb1
      FROM blocks a JOIN blocks b
        ON a.bi = b.bi AND a.bv = b.bv AND a.media_id < b.media_id)
    SELECT media_a, media_b,
           CAST({_MF_HAM_SQL} AS INT) AS hamming
    FROM cand
    WHERE {_MF_HAM_SQL} <= {_MF_HAM}
    ORDER BY media_a, media_b
"""


@query(
    "media_fuzzy_dedup",
    oracle=_MEDIA_FUZZY_ORACLE,
    doc="Binary fuzzy-fingerprint near-dup (ssdeep/TLSH shape, "
    "operators/multimodal.py::media_simhash_pairs): SimHash(96-bit, two "
    "bigint words) over byte-4-gram multisets of the BINARY content "
    "column — hex-substring gram extraction, md5 once per DISTINCT gram "
    "(vocabulary join), bit-majority fold — then 6x16-bit pigeonhole "
    "block buckets (the fewest/widest split: 65 536 buckets per block, "
    "vs 256 with the old 48-bit/8-bit scheme whose candidate volume "
    "grew ~n^2/85) and exact two-word hamming <= 5 verify. Catches "
    "re-encoded/trimmed blob variants that media_exact_dedup's "
    "whole-blob digest misses, without ever decoding; all JVM-side, "
    "blob bytes deterministic, full oracle.",
)
def media_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import media_simhash_pairs

    media = attach_media(load_table(spark, sf_dir, "documents"))
    return (
        media_simhash_pairs(media, nbits=_MF_NBITS, max_hamming=_MF_HAM)
        .select("media_a", "media_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("media_a", "media_b")
    )


# ---------------------------------------------------------------------------
# media near-dup clusters + reclaimable-bytes accounting
# ---------------------------------------------------------------------------

_MEDIA_CLUSTER_ORACLE = (
    "WITH RECURSIVE "
    + _MEDIA_FUZZY_ORACLE.split("WITH ", 1)[1].rsplit("SELECT media_a", 1)[0]
    + f""",
    verified AS (
      SELECT media_a, media_b FROM cand
      WHERE {_MF_HAM_SQL} <= {_MF_HAM}),
    edges AS (
      SELECT media_a AS u, media_b AS v FROM verified
      UNION SELECT media_b, media_a FROM verified),
    reach AS (
      SELECT u AS node, u AS lbl FROM edges
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node),
    cl AS (SELECT node AS media_id, MIN(lbl) AS cluster FROM reach GROUP BY node),
    sz AS (
      SELECT media_id, octet_length(content) AS nb FROM media)
    SELECT c.cluster,
           COUNT(*) AS n_blobs,
           CAST(SUM(s.nb) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN c.media_id <> c.cluster THEN s.nb ELSE 0 END)
                AS BIGINT) AS reclaimable_bytes
    FROM cl c JOIN sz s USING (media_id)
    GROUP BY c.cluster
    ORDER BY c.cluster
"""
)


@query(
    "media_neardup_clusters",
    oracle=_MEDIA_CLUSTER_ORACLE,
    doc="Near-dup blob clusters + storage accounting: connected components "
    "over the media_fuzzy_dedup pair graph (min reachable id = canonical "
    "keeper, the shared dedup_clusters min-label propagation), then "
    "per-cluster blob count / total bytes / bytes reclaimable by keeping "
    "only the canonical copy — the dedup-savings number a blob store "
    "reports. The component loop runs on the pair graph (candidate "
    "scale, never corpus scale); byte sizes come from one metadata "
    "projection of the media relation.",
)
def media_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.multimodal import media_simhash_pairs
    from ..operators.text_dedup import dedup_clusters

    media = attach_media(load_table(spark, sf_dir, "documents"))
    pairs = media_simhash_pairs(media, nbits=_MF_NBITS, max_hamming=_MF_HAM)
    cl = dedup_clusters(pairs, "media_a", "media_b")
    sz = media.select("media_id", F.length("content").alias("nb"))
    return (
        cl.select(F.col("doc").alias("media_id"), "cluster")
        .join(sz, "media_id")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("nb").cast("bigint").alias("total_bytes"),
            F.sum(F.when(F.col("media_id") != F.col("cluster"), F.col("nb")).otherwise(0))
            .cast("bigint")
            .alias("reclaimable_bytes"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# content-addressed blob-store release manifest
# ---------------------------------------------------------------------------

_BLOB_P = 2147483647
_BLOB_NSHARDS = 8
_H56 = "CAST(CONCAT('0x', SUBSTR(MD5(CAST({c} AS VARCHAR)), 1, 14)) AS BIGINT)"

_MEDIA_RELEASE_ORACLE = f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             md5(text) AS dg,
             octet_length(encode(text)) AS nb
      FROM documents),
    k AS (
      SELECT media_type, dg, nb FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY dg ORDER BY media_id) AS rn
        FROM m) WHERE rn = 1),
    sh AS (
      SELECT media_type, dg, nb,
             {_H56.format(c='dg')} % {_BLOB_NSHARDS} AS shard,
             ROW_NUMBER() OVER (PARTITION BY {_H56.format(c='dg')} % {_BLOB_NSHARDS}
                                ORDER BY dg) AS pos
      FROM k),
    comp AS (
      SELECT shard, string_agg(media_type || '=' || CAST(n AS VARCHAR), ','
                               ORDER BY media_type) AS composition
      FROM (SELECT shard, media_type, COUNT(*) AS n
            FROM sh GROUP BY shard, media_type)
      GROUP BY shard)
    SELECT s.shard, CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(SUM(s.nb) AS BIGINT) AS n_bytes,
           c.composition,
           CAST(CAST(SUM((s.pos % {_BLOB_P})
                         * ({_H56.format(c='s.dg')} % {_BLOB_P})
                         % {_BLOB_P}) AS HUGEINT) % {_BLOB_P} AS BIGINT)
               AS content_checksum
    FROM sh s JOIN comp c USING (shard)
    GROUP BY s.shard, c.composition
    ORDER BY s.shard
"""


@query(
    "media_release_manifest",
    oracle=_MEDIA_RELEASE_ORACLE,
    doc="Content-addressed blob-store release manifest — the media lane's "
    "doc_release_manifest: blobs exact-dedup to their md5 digest "
    "(keep-min owner; the digest IS the storage key, so dedup and "
    "addressing are the same operation), shards assign by digest hash "
    "(content-addressed: a blob's shard never changes when re-ingested, "
    "the property that makes takedown and replication surgical), and "
    "each shard reports blob count, byte total, per-type composition, "
    "and an order-sensitive mergeable modular checksum over the digests. "
    "JVM-side md5 over the binary column — no decode, no Python stage; "
    "one shuffle on the 16-byte digest at any corpus scale.",
)
def media_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..functions.hashing import hash56

    media = attach_media(load_table(spark, sf_dir, "documents"))
    w_k = W.partitionBy("dg").orderBy("media_id")
    k = (
        media.select(
            "media_id",
            "media_type",
            F.md5(F.col("content")).alias("dg"),
            F.length(F.col("content")).alias("nb"),
        )
        .withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") == 1)
    )
    shard = (hash56(F.col("dg")) % _BLOB_NSHARDS).cast("bigint")
    w_s = W.partitionBy(shard).orderBy("dg")
    sh = k.select(
        "media_type",
        "dg",
        "nb",
        shard.alias("shard"),
        F.row_number().over(w_s).cast("bigint").alias("pos"),
    )
    comp = (
        sh.groupBy("shard", "media_type")
        .agg(F.count("*").alias("n"))
        .groupBy("shard")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("media_type", "n"))),
                    lambda s: F.concat(
                        s["media_type"], F.lit("="), s["n"].cast("string")
                    ),
                ),
            ).alias("composition")
        )
    )
    from .training_data import _content_checksum_col

    main = sh.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_blobs"),
        F.sum("nb").cast("bigint").alias("n_bytes"),
        _content_checksum_col(F.col("pos"), F.col("dg")).alias(
            "content_checksum"
        ),
    )
    return (
        main.join(comp, "shard")
        .select("shard", "n_blobs", "n_bytes", "composition", "content_checksum")
        .orderBy("shard")
    )

"""Multimodal (image/audio/video) column plumbing.

Design for a 100 TB training-data pipeline: media rides as opaque
``binary`` columns with typed metadata alongside; all per-item compute is
Arrow-batched Python (``mapInPandas``) so bytes never round-trip through
JVM row objects one at a time. Schema and batch shape are real and tested;
the actual codec work (image decode / resample / frame extraction) is
STUBBED — the container has no PIL/ffmpeg/torchaudio — behind
``_require_codec`` which raises ``NotImplementedError`` unless a decoder
module is importable. The deterministic fallback path (hash-derived
metadata) keeps the full distributed plumbing exercisable and
oracle-checkable without codecs.

Partitioning note: media rows are large and skew-prone; callers should
``repartition`` on a uniform key (e.g. ``media_id``) before heavy decode
stages so one executor never holds the long tail of big blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _require_codec(kind: str):
    """Import the real decoder for ``kind`` or fail loudly.

    Real deployments plug PIL/ffmpeg here; this container has neither, so
    every real-decode path raises NotImplementedError — by design, per the
    stub contract. The hash-derived fake paths below stay fully functional.
    """
    raise NotImplementedError(
        f"no {kind} codec available in this environment; "
        "use the deterministic fake-metadata path (decode=False)"
    )


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test-fixture builder: derive a deterministic binary payload from a
    text column (UTF-8 bytes) + a media_type tag. Stands in for real blobs
    so the downstream plumbing is exercised with genuine binary data."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("content"),
    )


def extract_media_meta(media: DataFrame, decode: bool = False) -> DataFrame:
    """Per-item metadata via Arrow-batched ``mapInPandas``.

    decode=False (default): deterministic hash-derived metadata — md5 of
    the raw bytes; fake width/height decoded from the first two digest
    bytes (64 + b). decode=True: requires a real codec (stubbed).
    """
    if decode:
        _require_codec("image")

    # rebalance before the Python stage: a single-file scan is ONE partition,
    # which would serialize the Arrow-batched work (and at scale, decode
    # cost is per-item, not per-byte — round-robin beats split inheritance)
    media = media.repartition(media.sparkSession.sparkContext.defaultParallelism)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = [hashlib.md5(bytes(b)).hexdigest() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "content_md5": digests,
                    "width": [64 + int(d[0:2], 16) for d in digests],
                    "height": [64 + int(d[2:4], 16) for d in digests],
                }
            )

    return media.mapInPandas(batches, MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 1024, max_frames: int = 4) -> DataFrame:
    """Frame sampling shape: one input row fans out to ≤ ``max_frames``
    rows of ``frame_bytes``. The fake "decoder" slices the payload into
    fixed-size chunks; a real one would seek keyframes — identical plan
    shape (mapInPandas generator, rows ≠ 1:1 with input)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(blob)
                for i in range(min(max_frames, max(1, len(raw) // frame_size))):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(raw[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb_bytes", T.BinaryType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, decode: bool = False
) -> DataFrame:
    """Resize/resample shape: every input row maps to a FIXED-size output
    payload (``width*height // 64`` bytes here) regardless of input size —
    the property that makes a resize stage's output partitioning
    predictable at 100 TB (uniform row width, no long tail of huge blobs
    downstream). decode=True requires a real codec (stubbed); the fake
    path truncates/right-pads the payload to the target size, so the
    plumbing — Arrow batching, binary output column, fixed-width contract
    — is fully exercised and oracle-checkable."""
    if decode:
        _require_codec("image")
    target = max(1, (width * height) // 64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = [
                (bytes(b)[:target]).ljust(target, b".") for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "thumb_bytes": thumbs,
                    "thumb_md5": [hashlib.md5(t).hexdigest() for t in thumbs],
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        batches, RESIZE_SCHEMA
    )


def embed_media(media: DataFrame, dims: int = 8, decode: bool = False) -> DataFrame:
    """Feature extraction shape: media row -> dense ``array<double>``
    embedding, the bridge from the multimodal lane into the ANN/near-dup
    stack (the output schema is exactly what ``neardup_pairs_*`` and the
    IVF/topk operators consume). decode=True would run a real vision/audio
    encoder (stubbed); the fake path derives ``dims`` values from the
    content digest — deterministic, integer-valued doubles, so every
    downstream cosine fold is bit-exact on both engines."""
    if decode:
        _require_codec("embedding-model")
    if dims > 16:
        raise ValueError("fake digest-derived embeddings support dims <= 16")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = [hashlib.md5(bytes(b)).hexdigest() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "embedding": [
                        [float(int(d[2 * i : 2 * i + 2], 16)) for i in range(dims)]
                        for d in digests
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return media.mapInPandas(batches, schema)


def media_simhash_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    nbits: int = 96,
    max_hamming: int = 5,
    gram_bytes: int = 4,
) -> DataFrame:
    """Binary fuzzy-fingerprint near-dup pairs (ssdeep/TLSH-shaped) over a
    BINARY column — no codec, no decode: SimHash over byte-``gram_bytes``
    -gram multisets of the raw blob, wide-block LSH candidate buckets,
    exact hamming verify.

    Everything runs JVM-side: the blob is hex-encoded once, grams are
    substrings of the hex string (relational posexplode — no interpreted
    array lambdas), each gram occurrence is md5-hashed and folded
    STRAIGHT into the per-blob bit-majority sums, packed into ⌈nbits/48⌉
    bigint signature words. Occurrence-level folding was measured
    against both a gram-count+vocabulary-join design (md5 once per
    distinct gram) and a packed-lane design: the extra map-side hashing
    is cheaper at every sweep point than the corpus-bytes-scale
    (blob, gram) shuffle it removes (k10: 58.5 s vs 72.1 s), because
    the only remaining shuffle is the per-blob partial-aggregate rows —
    97 bigints per blob, collapsed map-side.

    Blocking follows the text lane's measured widest-block discipline
    (``text_dedup.simhash_pairs``): exactly ``max_hamming + 1`` disjoint
    blocks — the pigeonhole MINIMUM, so each block is as wide as the
    bound allows — guarantee every pair within ``max_hamming`` agrees on
    at least one block; candidates come from an equi-join on
    (block_idx, block_val), never all-pairs. Block width is what bounds
    the Σ bucket² candidate volume: the r7 default (48-bit signature →
    6×8-bit blocks, 256 buckets/block) left a latent ~n²-scale candidate
    term at blob-store scale; the 96-bit two-word signature widens the
    same 6 blocks to 16 bits = 65 536 buckets/block. Measured at sf0.1
    (5 000 blobs): 6×8-bit → 2 784 726 distinct candidate pairs, max
    bucket 1 101; 6×16-bit → 210 956 candidates, max bucket 256 — a
    13.2× cut, with random-collision bucket load n/65 536 staying O(1)
    far past 10⁶ blobs (the residual candidates are genuinely correlated
    sub-signatures, which no exact-recall blocking can drop). The
    pigeonhole guarantee is exact at every width — every pair within
    ``max_hamming`` of each other on the FULL signature shares a block —
    so widening trades nothing; note the wider signature also sharpens
    the near-dup CRITERION itself (hamming ≤ 5 of 96 bits ≈ 5% bit
    error vs 10% of 48), which is the precision a blob store wants.
    At 100 TB the gram relation is corpus-bytes-scale but collapses
    map-side (groupBy combine) before the only wide shuffle, and the
    block join keys on uniform hash bits (no skew).

    The verified pair set is session-memoized (the text-dedup lane
    discipline): the standalone pair query and the clustering /
    accounting consumers share one signature build + block join per
    (corpus, params).
    """
    from .text_dedup import _memo

    return _memo(
        media,
        ("media_simhash_pairs", id_col, content_col, nbits, max_hamming, gram_bytes),
        lambda: _media_simhash_pairs_build(
            media, id_col, content_col, nbits, max_hamming, gram_bytes
        ),
    )


def _media_simhash_pairs_build(
    media: DataFrame,
    id_col: str,
    content_col: str,
    nbits: int,
    max_hamming: int,
    gram_bytes: int,
) -> DataFrame:
    from .text_dedup import _hash_bit

    # fewest/widest pigeonhole split: exactly max_hamming+1 disjoint blocks
    nblocks = max_hamming + 1
    assert nbits % nblocks == 0, "nbits must split into max_hamming+1 blocks"
    width = nbits // nblocks
    # signature words are 48-bit bigints (md5 hex 12 chars per word);
    # blocks must not straddle a word boundary
    nwords = (nbits + 47) // 48
    assert nwords <= 2, "signatures wider than 96 bits are not supported"
    assert nbits <= 48 or (48 % width == 0 and nbits % 48 == 0), (
        "blocks must align with the 48-bit signature words"
    )
    from ..sources.catalog import rebalance_compute

    # The gram explode + per-occurrence md5 + 97-buffer aggregate PARTIALS
    # all execute in the stage that reads the blobs; a single-file scan
    # plans as one task and serializes that entire cascade on one core
    # (measured: 11.7 s -> 3.1 s at sf0.1 with 32 cores). The rebalance
    # is conditional — at production scale the blob table arrives as
    # >= cores splits and no exchange is added, so the corpus bytes are
    # never shuffled for this (the docstring's one-wide-shuffle argument
    # stands).
    hexed = rebalance_compute(
        media.filter(F.length(content_col) >= gram_bytes).select(
            F.col(id_col).alias("_id"),
            F.lower(F.hex(F.col(content_col))).alias("_hx"),
            F.length(F.col(content_col)).alias("_nb"),
        )
    )
    grams = hexed.select(
        "_id",
        F.posexplode(F.sequence(F.lit(0), F.col("_nb") - gram_bytes)).alias(
            "_i", "_pos"
        ),
        "_hx",
    ).select(
        "_id",
        F.substring(F.col("_hx"), F.col("_pos") * 2 + 1, gram_bytes * 2).alias(
            "_gram"
        ),
    )
    # Hash per gram OCCURRENCE and fold straight into the per-blob
    # bit-majority sums: Σ_occurrences ±1 ≡ Σ_distinct ±cnt, so this is
    # bit-identical to a gram-count formulation — but the partial
    # aggregation collapses to ONE row per blob per partition BEFORE the
    # only shuffle (97 bigints per blob), where the count/vocab-join
    # design shuffled the corpus-bytes-scale (blob, gram) relation twice.
    # md5 per occurrence costs more hashing than once-per-distinct-gram,
    # but hashing is map-side CPU; at every measured sweep point the
    # shuffle it removes dominates. Word w holds signature bits
    # [48w, 48w+48): md5 hex chars 12w+1 .. 12w+12.
    word_bits = [min(48, nbits - 48 * w) for w in range(nwords)]
    h = grams.select(
        "_id",
        *[
            F.conv(
                F.substring(F.md5(F.col("_gram")), 12 * w + 1, word_bits[w] // 4),
                16,
                10,
            )
            .cast("bigint")
            .alias(f"_h{w}")
            for w in range(nwords)
        ],
    )
    sums = h.groupBy("_id").agg(
        *[
            F.sum(2 * _hash_bit(F.col(f"_h{b // 48}"), b % 48) - 1).alias(f"_s{b}")
            for b in range(nbits)
        ]
    )
    sig_words = []
    for w in range(nwords):
        sig_expr = None
        for lb in range(word_bits[w]):
            term = F.when(
                F.col(f"_s{48 * w + lb}") > 0, F.lit(1 << lb)
            ).otherwise(F.lit(0))
            sig_expr = term if sig_expr is None else sig_expr + term
        sig_words.append(sig_expr.cast("bigint").alias(f"_sig{w}"))
    sigs = sums.select("_id", *sig_words)
    mask = (1 << width) - 1
    blocked = sigs.select(
        "_id",
        *[f"_sig{w}" for w in range(nwords)],
        F.posexplode(
            F.array(
                *[
                    F.shiftright(
                        F.col(f"_sig{(i * width) // 48}"), (i * width) % 48
                    ).bitwiseAND(F.lit(mask))
                    for i in range(nblocks)
                ]
            )
        ).alias("_bi", "_bv"),
    )
    left = blocked.select(
        F.col("_id").alias("media_a"),
        *[F.col(f"_sig{w}").alias(f"_sa{w}") for w in range(nwords)],
        "_bi",
        "_bv",
    )
    right = blocked.select(
        F.col("_id").alias("media_b"),
        *[F.col(f"_sig{w}").alias(f"_sb{w}") for w in range(nwords)],
        "_bi",
        "_bv",
    )
    ham = None
    for w in range(nwords):
        term = F.bit_count(F.col(f"_sa{w}").bitwiseXOR(F.col(f"_sb{w}")))
        ham = term if ham is None else ham + term
    return (
        left.join(right, ["_bi", "_bv"])
        .filter(F.col("media_a") < F.col("media_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["media_a", "media_b"])
        .select("media_a", "media_b", "hamming")
    )

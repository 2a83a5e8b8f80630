"""Multimodal plumbing tests: binary columns, Arrow-batched metadata,
frame fan-out shape, and the codec stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from date_warehouse___airline_project_spark.operators.multimodal import (
    attach_media,
    extract_media_meta,
    embed_media,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "alpha " * 300), (1, "beta"), (2, "gamma " * 600)], ["doc_id", "text"]
    )
    return attach_media(docs)


def test_attach_media_binary_and_type(media):
    rows = {r.media_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    assert bytes(rows[1].content) == b"beta"


def test_extract_media_meta_deterministic(media):
    rows = {r.media_id: r for r in extract_media_meta(media).collect()}
    d = hashlib.md5(b"beta").hexdigest()
    assert rows[1].content_md5 == d
    assert rows[1].n_bytes == 4
    assert rows[1].width == 64 + int(d[0:2], 16)
    assert rows[1].height == 64 + int(d[2:4], 16)


def test_sample_frames_fanout(media):
    # only the video row (3600 bytes) fans out; 1024-byte frames, max 4
    frames = sample_frames(media, frame_size=1024, max_frames=4).collect()
    assert {f.media_id for f in frames} == {2}
    assert [f.frame_idx for f in sorted(frames, key=lambda f: f.frame_idx)] == [0, 1, 2]
    assert all(len(bytes(f.frame_bytes)) == 1024 for f in frames)


def test_real_decode_paths_are_stubbed(media):
    with pytest.raises(NotImplementedError):
        resize_media(media, 224, 224, decode=True)
    with pytest.raises(NotImplementedError):
        extract_media_meta(media, decode=True)
    with pytest.raises(NotImplementedError):
        embed_media(media, decode=True)


def test_resize_fixed_width_contract(media):
    # every thumbnail is exactly (w*h)//64 bytes — short payloads padded,
    # long ones truncated — and only image rows survive
    out = resize_media(media, 32, 32).collect()
    assert all(len(bytes(r.thumb_bytes)) == 16 for r in out)
    assert {r.media_id for r in out} == {0}


def test_embed_media_feeds_the_ann_stack(media, spark):
    # the embedding column plugs straight into the shared pair operator
    from date_warehouse___airline_project_spark.operators.similarity import (
        neardup_pairs_bucketed,
    )

    emb = embed_media(media, dims=8).select(
        (F.col("media_id")).alias("vec_id"), "embedding"
    )
    rows = emb.collect()
    assert all(len(r.embedding) == 8 for r in rows)
    assert all(0.0 <= v <= 255.0 for r in rows for v in r.embedding)
    # operator-compatibility: runs end to end (pair count is data-dependent)
    neardup_pairs_bucketed(emb, threshold=0.99, nplanes=2).collect()


def test_media_simhash_pairs_edges(spark):
    """Blobs shorter than one gram are excluded (no pairs, no error);
    identical blobs pair at hamming 0; a disjoint-content blob pairs
    with neither."""
    from date_warehouse___airline_project_spark.operators.multimodal import (
        media_simhash_pairs,
    )
    from pyspark.sql import functions as F

    media = spark.createDataFrame(
        [
            (1, b"the quick brown fox jumps over the lazy dog " * 4),
            (2, b"the quick brown fox jumps over the lazy dog " * 4),
            (3, b"zZ"),  # < 4 bytes: no grams, excluded entirely
            (4, bytes(range(256)) * 2),
        ],
        "media_id long, content binary",
    )
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in media_simhash_pairs(media).collect()
    }
    assert pairs == {(1, 2): 0}

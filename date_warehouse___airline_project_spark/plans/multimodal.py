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

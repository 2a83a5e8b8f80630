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

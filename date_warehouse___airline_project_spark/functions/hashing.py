"""Engine-portable deterministic hashing (the repo-wide convention).

``hash56(col)`` = the first 14 hex chars (56 bits) of ``md5(cast(col as
string))`` as a non-negative bigint. One definition, used by sampling
gates, data mixing, shard assignment, and sketch hash families — if the
construction ever changes, it changes here and in each query's colocated
DuckDB oracle template (kept next to its SQL so the certified strings stay
reviewable in place):

    CAST(CONCAT('0x', SUBSTR(MD5(CAST({c} AS VARCHAR)), 1, 14)) AS BIGINT)

56 bits so the value fits a signed 64-bit long. ``operators.text_dedup``
keeps its own width-parameterized ``_hash_int`` for minhash (which needs
seeded variants); it is the same construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash56(col: Column) -> Column:
    """56-bit md5-prefix hash of ``col`` (cast to string) as bigint."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 14), 16, 10).cast("bigint")


def seeded_bucket(col: Column, seed: Column, width: int) -> Column:
    """Member of a seeded hash family: ``hash56(seed ':' col) % width``.

    Independent buckets per seed value — the construction behind the Bloom
    and Count-Min hash families (plans/sketches.py) and their streaming
    maintenance (streaming/sketch_stream.py).
    """
    return (
        hash56(F.concat(seed.cast("string"), F.lit(":"), col.cast("string"))) % width
    )

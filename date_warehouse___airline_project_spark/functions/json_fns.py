"""JSON / semi-structured expressions.

Parity target (reference): JSON.parse with raw-string fallback
(kafkaworker.js:47-52), nested field access (kafkaworker.js:69), serialize
(cleaning.py:116).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_json_with_raw_fallback(col: Column | str, schema: T.StructType) -> Column:
    """from_json with the reference's fallback: unparseable payloads become
    a struct whose ``raw`` field holds the original string.

    The returned struct is ``schema`` extended with a ``raw`` string field;
    exactly one of (parsed fields, raw) is populated.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, schema)
    with_raw = T.StructType(schema.fields + [T.StructField("raw", T.StringType())])
    names = [f.name for f in schema.fields]
    ok = F.struct(*[parsed[n].alias(n) for n in names], F.lit(None).cast("string").alias("raw"))
    bad = F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields],
        c.alias("raw"),
    )
    return F.when(parsed.isNotNull(), ok).otherwise(bad).cast(with_raw.simpleString())

"""Connector-protocol queries: the Kafka seam, executed and certified.

The repo's Kafka surface (SURVEY §2.1 S9/S10) is a pinned option
contract plus — since r11 — an executable Kafka-semantics source/sink
over a file-backed topic log (``sources/kafka_log.py``, public Python
Data Source API). This module puts that PROTOCOL under the driver's
oracle gate: a deterministic message feed is produced into a session
topic (unkeyed → round-robin partitioning, so placement and offsets are
pure functions of the send order), read back through
``format("kafkalog")`` — the same reader plan the real connector
serves — and summarized per partition. The DuckDB oracle re-derives
partition assignment, offset ranges, and value integrity from the raw
table, so a protocol bug anywhere in producer, log layout, offset
bookkeeping, or reader surfaces as a hash mismatch.

Reference basis: the reference's consumer worker subscribes to one topic
with earliest offsets (backend/kafkaworker.js:28-44); the topic shape
here mirrors that deployment (2 partitions, subscribe mode).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import session_tmpdir
from ..sources.catalog import load_table
from .registry import query

_N_MSGS = 2000  # bounded: doc_id < 2000 (the whole table at small SFs)
_TOPIC = "doc_feed"
_KLOG_MEMO: dict = {}


def _session_topic(spark: SparkSession, sf_dir: str) -> str:
    """ONE produced topic per (session, corpus): `_N_MSGS` messages, one
    per document in doc_id order, UNKEYED so the producer round-robins —
    partition = send_rank % 2 and offset = send_rank // 2 are then pure
    functions of doc_id rank, which is what makes the protocol
    oracle-checkable. The produce loop is a bounded driver-side append
    (the producer is the driver-local stand-in for a broker — see
    sources/kafka_log.py); the READ side is the distributed plan under
    test."""
    key = (spark.sparkContext.applicationId, sf_dir, _N_MSGS, "klog")
    root = _KLOG_MEMO.get(key)
    if root is None:
        from ..sources.kafka_log import KafkaLogProducer

        root = session_tmpdir("spark_graft_kafka_log_")
        producer = KafkaLogProducer(root, n_partitions=2)
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _N_MSGS)
            .select("doc_id", "n_chars")
            .orderBy("doc_id")
            .collect()
        )
        for r in rows:
            producer.send(
                _TOPIC,
                json.dumps({"doc_id": r["doc_id"], "n_chars": r["n_chars"]}),
            )
        producer.close()
        _KLOG_MEMO[key] = root
    return root


@query(
    "kafka_log_topic_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id < {_N_MSGS}),
    r AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn
      FROM d)
    SELECT CAST(rn % 2 AS INT) AS partition,
           CAST(COUNT(*) AS BIGINT) AS n_messages,
           CAST(MIN(rn // 2) AS BIGINT) AS min_offset,
           CAST(MAX(rn // 2) AS BIGINT) AS max_offset,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
    FROM r GROUP BY rn % 2 ORDER BY partition
""",
    doc="Kafka protocol certification (S9/S10 executed): a deterministic "
    "document feed is produced into a session topic via the log-backed "
    "producer (sources/kafka_log.py — unkeyed round-robin placement), "
    "read back through format('kafkalog') — the public Python Data "
    "Source serving the REAL Kafka source's schema and option names — "
    "and summarized per partition (message count, offset range, value "
    "payload sums parsed back out of the message values). The oracle "
    "re-derives placement/offsets/payload from the raw table, so any "
    "drift in producer partitioning, offset bookkeeping, log layout, or "
    "the reader's range scan hash-mismatches. The gapless offset ranges "
    "(min 0, max = n-1 per partition) are the at-least-once consumer's "
    "resume contract. Reader parallelism is one task per topic "
    "partition, the real connector's shape.",
)
def kafka_log_topic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.kafka_log import register_kafka_log_source

    root = _session_topic(spark, sf_dir)
    register_kafka_log_source(spark)
    msgs = (
        spark.read.format("kafkalog")
        .option("path", root)
        .option("subscribe", _TOPIC)
        .load()
        .select(
            "partition",
            "offset",
            F.from_json(
                F.col("value").cast("string"),
                "doc_id LONG, n_chars LONG",
            ).alias("m"),
        )
    )
    return (
        msgs.groupBy(F.col("partition"))
        .agg(
            F.count("*").cast("bigint").alias("n_messages"),
            F.min("offset").cast("bigint").alias("min_offset"),
            F.max("offset").cast("bigint").alias("max_offset"),
            F.sum("m.doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("m.n_chars").cast("bigint").alias("sum_n_chars"),
        )
        .orderBy("partition")
    )

"""Outbox-table change feed — the real CDC shape for S11.

Reference dataflow (supabaseWatcher.js:36-63): the watcher subscribes to
INSERT events on the ``outbox`` table and forwards each event's
``payload.new`` row to the Kafka producer. The outbox pattern is CDC-lite
by construction: the table is append-only, so the INSERT feed IS the
complete change stream (no update/delete images to merge).

Spark-first: an append-only parquet directory is the outbox table, and a
file stream over it is the change feed — each newly committed file's rows
arrive exactly once as typed INSERT envelopes ``{op, new}`` that mirror
the watcher's ``payload.new`` contract. ``outbox_to_kafka_values``
re-serializes the envelope to the producer's message ``value``, so the
feed plugs into ``run_eligibility_stream`` / ``kafka_results_sink``
unchanged — the full watcher→producer→worker path with no stand-in shapes.

At scale the same two functions run unchanged over a real change source:
swap the file stream for a Delta Change Data Feed or Debezium/Kafka topic
emitting the same ``{op, new}`` envelope; everything downstream is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# outbox row contract (supabaseWatcher.js:36-63 payload.new): the fields
# the watcher forwards into the Kafka message envelope.
OUTBOX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("passengerId", T.StringType()),
                    T.StructField("firstName", T.StringType()),
                    T.StructField("lastName", T.StringType()),
                    T.StructField("flightNumber", T.StringType()),
                ]
            ),
        ),
        T.StructField("requested_at", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)


def outbox_change_feed(spark: SparkSession, outbox_dir: str) -> DataFrame:
    """INSERT-event stream over an append-only parquet outbox table.

    Each new row becomes ``(op='insert', new=<typed row struct>)`` — the
    watcher's change-event envelope. ``maxFilesPerTrigger`` is left to the
    caller's trigger config; file-commit granularity bounds each
    micro-batch exactly as the watcher's event granularity does.
    """
    rows = spark.readStream.schema(OUTBOX_SCHEMA).parquet(outbox_dir)
    return rows.select(
        F.lit("insert").alias("op"),
        F.struct(*[F.col(f.name) for f in OUTBOX_SCHEMA.fields]).alias("new"),
    )


def outbox_to_kafka_values(feed: DataFrame) -> DataFrame:
    """``payload.new`` → producer message value (supabaseWatcher.js:52-58).

    Serializes exactly the envelope fields the worker's MESSAGE_SCHEMA
    parses back (``{type, payload, requested_at}``), so
    outbox → values → ``parse_messages`` is a typed roundtrip.
    """
    return feed.select(
        F.to_json(
            F.struct(
                F.col("new.type").alias("type"),
                F.col("new.payload").alias("payload"),
                F.col("new.requested_at").alias("requested_at"),
            )
        ).alias("value")
    )

"""Streaming insurance-eligibility pipeline.

Reference dataflow (SURVEY §3.3): INSERT on ``outbox`` → Realtime watcher
(supabaseWatcher.js:36-63) → Kafka producer → consumer worker
(kafkaworker.js:41-150) which audit-logs every message, dispatches on
``type == 'eligibility_check'``, looks up the latest flight row, computes
delay/eligibility with a six-value reasons enum, and appends
``eligibility_results``.

Spark-first collapse: ONE streaming query.

  readStream (text lines = Kafka values)
    → from_json with raw-string fallback (kafkaworker.js:47-52 JSON.parse
      try/catch re-expressed as a null-check coalesce — F-J2)
    → foreachBatch:
        audit append        (every message, kafka_messages shape — ST2/ST5)
        filter type → stream-static join vs flights → verdicts
        results append      (eligibility_results shape)

foreachBatch is used (rather than two independent sinks) because the
reference's worker performs BOTH side effects per message batch; the
checkpoint makes replay idempotent-at-batch granularity — an uplift over
the reference's at-least-once consumer.

The verdict logic is ``pipelines.eligibility.check_eligibility`` — the
exact same lazy plan serves batch and streaming (stream-static joins are
natively supported), so correctness tests on the batch form certify the
streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipelines.eligibility import check_eligibility

# kafkaworker.js:67-70 message envelope: {type, payload:{passengerId,
# firstName, lastName, flightNumber}, requested_at}
MESSAGE_SCHEMA = T.StructType(
    [
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
    ]
)


def parse_messages(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON parse with raw fallback: unparseable payloads survive as
    ``raw`` with null type (they are audited but never dispatched)."""
    parsed = F.from_json(F.col(value_col), MESSAGE_SCHEMA)
    return raw.select(
        F.col(value_col).alias("raw_value"),
        # from_json yields a null struct on malformed input → type stays null
        parsed.alias("msg"),
    ).select(
        "raw_value",
        F.col("msg.type").alias("type"),
        F.col("msg.payload.passengerId").alias("passenger_id"),
        F.col("msg.payload.firstName").alias("first_name"),
        F.col("msg.payload.lastName").alias("last_name"),
        F.col("msg.payload.flightNumber").alias("flight_number"),
        F.col("msg.requested_at").alias("requested_at"),
    )


def eligibility_requests(messages: DataFrame) -> DataFrame:
    """Dispatch: only eligibility_check messages become requests (F-J4)."""
    return messages.filter(F.col("type") == "eligibility_check").select(
        "passenger_id", "first_name", "last_name", "flight_number", "requested_at"
    )


def kafka_source_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The EXACT consumer option set the reference worker subscribes with
    (kafkaworker.js:28-44): one ``subscribe`` topic (not assign/pattern),
    earliest offsets so a restarted worker drains the backlog. Kept as a
    pure dict so the contract test can pin it without the connector jar —
    dropping the jar onto the classpath makes the deployment config-only.
    """
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint_dir: str
) -> dict[str, str]:
    """Producer option set (kafkaProducer.js:36-44) — same pin rationale."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def kafka_messages_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka consumer source (kafkaworker.js:28-44): topic → raw value lines.

    Emits the same single-column ``value: string`` shape as the drop-dir
    stand-in, so ``parse_messages`` and everything downstream are shared
    verbatim between the two deployments. Requires the
    ``spark-sql-kafka-0-10`` connector on the classpath (standard on any
    Spark cluster; absent in this container, where resolution raises and
    tests skip — the construction path itself is exercised either way).
    """
    return (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(bootstrap_servers, topic, starting_offsets))
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_log_messages_source(
    spark: SparkSession,
    log_root: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The Kafka consumer PLAN, executable in this container: identical
    option names (``subscribe``, ``startingOffsets``), identical output
    schema, identical downstream ``value`` cast — served by the in-repo
    Kafka-semantics log source (``sources/kafka_log.py``, public Python
    Data Source API) instead of the absent connector jar. Swapping in a
    real broker changes ONLY ``format`` + ``kafka.bootstrap.servers``;
    everything from the ``.select`` down is the same bytes. This is the
    execution test the option-contract pin could not give: offsets,
    checkpoint resume, and at-least-once replay all actually run."""
    from ..sources.kafka_log import register_kafka_log_source

    register_kafka_log_source(spark)
    return (
        spark.readStream.format("kafkalog")
        .option("path", log_root)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_log_results_sink(
    results: DataFrame, log_root: str, topic: str, checkpoint_dir: str
):
    """Producer side against the log-backed topic: each result row
    becomes one JSON-envelope message (same ``to_json(struct(*))`` value
    shape as ``kafka_results_sink``), sent keyed on passenger_id so a
    partition preserves per-passenger order — Kafka's keyed-ordering
    contract. foreachBatch + driver-side send is the stand-in's
    transport (results are verdict-sized); the real sink is the
    ``format("kafka")`` writer with the same value column."""
    from ..sources.kafka_log import kafka_log_values_sink

    vals = results.select(
        F.col("passenger_id"),
        F.to_json(F.struct(*results.columns)).alias("value"),
    )
    return kafka_log_values_sink(
        vals, log_root, topic, checkpoint_dir, key_col="passenger_id"
    )


def kafka_results_sink(
    results: DataFrame, bootstrap_servers: str, topic: str, checkpoint_dir: str
):
    """Kafka producer sink (kafkaProducer.js:36-44): each result row becomes
    one JSON-envelope message on ``topic``. Returns the DataStreamWriter
    (caller ``.start()``s it)."""
    return (
        results.select(F.to_json(F.struct(*results.columns)).alias("value"))
        .writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, checkpoint_dir))
    )


def run_eligibility_stream(
    spark: SparkSession,
    input_dir: str,
    flights: DataFrame,
    audit_dir: str,
    results_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    source: DataFrame | None = None,
):
    """Start the collapsed watcher+worker query over a line-JSON drop dir.

    ``input_dir`` stands in for the Kafka topic; pass ``source=
    kafka_messages_source(...)`` to run the identical plan off a real
    topic — the source emits the same ``value: string`` shape, so the rest
    of the pipeline is unchanged. Returns the StreamingQuery handle.
    """
    raw = source if source is not None else spark.readStream.format("text").load(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        msgs = parse_messages(batch_df, "value").persist()
        try:
            # ST2/ST5: audit-append every message before dispatch
            (
                msgs.withColumn("batch_id", F.lit(batch_id))
                .withColumn("processed_at", F.current_timestamp())
                .select("batch_id", "raw_value", "type", "processed_at")
                .write.mode("append")
                .parquet(audit_dir)
            )
            requests = eligibility_requests(msgs)
            verdicts = check_eligibility(requests, flights)
            verdicts.write.mode("append").parquet(results_dir)
        finally:
            msgs.unpersist()

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("eligibility_stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

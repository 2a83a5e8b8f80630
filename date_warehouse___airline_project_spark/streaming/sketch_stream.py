"""Incremental Count-Min sketch maintenance over a stream.

CMS cells are pure counts, so the sketch is MERGEABLE: cells(A ∪ B) =
cells(A) + cells(B) summed per (depth, cell). That makes the streaming
form trivial-by-construction — each micro-batch builds its own cell
counts (one explode + map-side-combined aggregate, exactly the batch
query's plan) and folds them into a persistent state table with a
sum-merge. No per-key state store is needed: the state is the d×w cell
table itself, bounded regardless of stream cardinality — the reason
sketches are the scale path for streaming frequency tracking.

State writes go through the same temp-dir + rename swap discipline as
``sources.merge_target``. foreachBatch is AT-LEAST-ONCE: a crash after
the state swap but before the streaming checkpoint commits re-delivers
the batch, and a sum-merge is not idempotent — so the last-applied
``batch_id`` is written INSIDE the state dir in the same atomic swap,
and ``process_batch`` skips any batch_id already folded. A crash landing
between the two swap renames (no live state dir) is recovered at stream
start by restoring the newest ``.old-*`` backup; the interrupted batch
then redelivers and re-applies on top. Stale ``.tmp-*``/``.old-*``
siblings from prior crashes are swept at stream start so restarts don't
accumulate orphaned state copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import seeded_bucket


def cms_cells(rows: DataFrame, key_col: str, depth: int = 3, width: int = 256) -> DataFrame:
    """(d, cell, cnt) Count-Min cell counts for one relation — the same
    construction as plans/sketches.py::cms_frequency_sketch."""
    seeds = F.array(*[F.lit(d) for d in range(depth)])
    return (
        rows.select(F.col(key_col), F.explode(seeds).alias("d"))
        .groupBy("d", seeded_bucket(F.col(key_col), F.col("d"), width).alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def merge_cells(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold a batch's cells into the state: per-(d, cell) count sum."""
    return (
        state.unionByName(batch)
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


# Swap/recovery/idempotence discipline shared with the continuous-
# aggregate rollup — one definition in state_table.py; names re-exported
# here for existing callers and tests.
from .state_table import (  # noqa: E402,F401
    _BATCH_ID_FILE,
    fold_into_state,
    last_applied_batch_id,
    recover_state,
)


def run_cms_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    depth: int = 3,
    width: int = 256,
    available_now: bool = True,
):
    """Maintain a persistent CMS over a line-delimited key drop dir.

    Returns the StreamingQuery. Swap the file source for the Kafka
    consumer (``eligibility_stream.kafka_messages_source``) unchanged —
    the per-batch plan only needs a ``value``-shaped column.
    """
    recover_state(state_dir)
    raw = spark.readStream.format("text").load(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keys = batch_df.select(F.col("value").cast("long").alias(key_col)).where(
            F.col(key_col).isNotNull()
        )
        cells = cms_cells(keys, key_col, depth, width)
        fold_into_state(spark, state_dir, batch_id, cells, merge_cells)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("cms_stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_registers(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold a batch's HLL registers into the state: per-idx rank MAX."""
    return (
        state.unionByName(batch)
        .groupBy("idx")
        .agg(F.max("r").alias("r"))
    )


def run_hll_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    available_now: bool = True,
):
    """Maintain a persistent HyperLogLog register table over a
    line-delimited key drop dir.

    Register MAX is idempotent AND associative, so unlike the CMS
    sum-merge the fold would tolerate redelivery even without the
    batch-id guard — the shared ``fold_into_state`` discipline still
    applies it, which also covers the swap/recovery semantics. The state
    is <= m rows regardless of stream cardinality; the distinct-count
    estimate is computed from the register table on read (see
    ``plans/sketches.py::hll_distinct_sketch`` for the estimator).
    """
    from ..plans.sketches import hll_registers

    recover_state(state_dir)
    raw = spark.readStream.format("text").load(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keys = batch_df.select(F.col("value").cast("long").alias(key_col)).where(
            F.col(key_col).isNotNull()
        )
        regs = hll_registers(keys, key_col)
        fold_into_state(spark, state_dir, batch_id, regs, merge_registers)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("hll_stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bloom_bits(rows: DataFrame, key_col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """(bit) distinct Bloom bit rows for one relation — the same
    construction as plans/sketches.py::bloom_membership_sketch."""
    seeds = F.array(*[F.lit(j) for j in range(k)])
    return (
        rows.select(F.col(key_col), F.explode(seeds).alias("j"))
        .select(seeded_bucket(F.col(key_col), F.col("j"), m).alias("bit"))
        .distinct()
    )


def merge_bits(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Union-distinct fold: Bloom state is the SET of set bits (bit-OR)."""
    return state.unionByName(batch).distinct()


def run_bloom_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    m: int = 4096,
    k: int = 3,
    available_now: bool = True,
):
    """Maintain a persistent Bloom bit set over a line-delimited key drop
    dir. Bit-OR (union-distinct here) is idempotent AND associative like
    the HLL register MAX, so redelivery would be harmless even without
    the shared batch-id guard; the fold still goes through
    ``fold_into_state`` for the swap/recovery semantics. State is <= m
    rows at any stream cardinality; probes join the broadcast bit set
    exactly as in the batch query.
    """
    recover_state(state_dir)
    raw = spark.readStream.format("text").load(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keys = batch_df.select(F.col("value").cast("long").alias(key_col)).where(
            F.col(key_col).isNotNull()
        )
        bits = bloom_bits(keys, key_col, m, k)
        fold_into_state(spark, state_dir, batch_id, bits, merge_bits)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("bloom_stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_grouped_registers(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold grouped HLL registers: per-(group, idx) rank MAX."""
    return (
        state.unionByName(batch)
        .groupBy("grp", "idx")
        .agg(F.max("r").alias("r"))
    )


def run_grouped_hll_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain per-group HyperLogLog registers over a drop dir of
    ``group,key`` CSV lines — the continuously-maintained form of
    plans/sketches.py::hll_grouped_daily_uniques (daily unique users).

    State is <= groups x m rows; the per-(group, idx) register MAX is
    idempotent and associative, so late/out-of-order arrivals for ANY
    group — including days long since 'closed' — fold correctly with no
    reprocessing window, which is the operational advantage of sketch
    state over exact per-day distinct sets.
    """
    from ..plans.sketches import hll_registers

    recover_state(state_dir)
    raw = spark.readStream.format("text").load(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = batch_df.select(
            F.split(F.col("value"), ",").alias("_p")
        ).select(
            F.col("_p").getItem(0).alias("grp"),
            F.col("_p").getItem(1).cast("long").alias("user_id"),
        ).where(F.col("grp").isNotNull() & F.col("user_id").isNotNull())
        # reuse the global register computation per group: hll_registers
        # groups only by idx, so apply it via a grouped re-aggregation
        from ..functions.hashing import hash56

        lbv = spark.createDataFrame(
            [(j, 1 << j) for j in range(50)], "j int, lowbit long"
        )
        parts = parsed.select(
            "grp", hash56(F.col("user_id")).alias("hv")
        ).select(
            "grp",
            (F.col("hv") % 64).alias("idx"),
            F.expr("hv div 64").alias("rest"),
        )
        regs = (
            parts.join(
                F.broadcast(lbv), F.expr("rest & (-rest)") == F.col("lowbit"), "left"
            )
            .select(
                "grp",
                "idx",
                F.when(F.col("rest") == 0, F.lit(51)).otherwise(F.col("j") + 1).alias("rank"),
            )
            .groupBy("grp", "idx")
            .agg(F.max("rank").alias("r"))
        )
        fold_into_state(spark, state_dir, batch_id, regs, merge_grouped_registers)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("grouped_hll_stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_estimate_report(
    spark: SparkSession,
    state_dir: str,
    keys: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """(key, cms_estimate) frequency estimates for the given keys off the
    stream-maintained cell table: each key probes its d cells (same
    ``seeded_bucket`` family as the fold's ``cms_cells``) and takes the
    MIN — the batch query's probe shape against persistent state. The
    state is ≤ d×w rows, so it broadcasts at any stream volume."""
    cells = spark.read.parquet(state_dir)
    seeds = F.array(*[F.lit(d) for d in range(depth)])
    probe = keys.select(key_col, F.explode(seeds).alias("d")).select(
        key_col,
        "d",
        seeded_bucket(F.col(key_col), F.col("d"), width).alias("cell"),
    )
    return (
        probe.join(F.broadcast(cells), ["d", "cell"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )


def hll_estimate_report(spark: SparkSession, state_dir: str) -> DataFrame:
    """(n_registers_set, hll_estimate) distinct-count estimate off the
    stream-maintained register table — the batch query's small-range-
    corrected estimator verbatim (``plans/sketches.py::
    hll_estimate_summary``). State is ≤ m rows at any stream volume."""
    from ..plans.sketches import hll_estimate_summary

    regs = spark.read.parquet(state_dir)
    return hll_estimate_summary(regs).select(
        "n_registers_set",
        F.round(F.col("_corrected"), 4).alias("hll_estimate"),
    )


def bloom_membership_report(
    spark: SparkSession,
    state_dir: str,
    keys: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
) -> DataFrame:
    """(key, maybe_member) membership probes against the stream-
    maintained Bloom bit set: a key is a possible member iff all k of
    its bits are set (the batch query's probe shape). The bit relation
    is ≤ m rows — broadcast at any stream volume; definite negatives
    are exact, positives carry the usual false-positive rate."""
    bits = spark.read.parquet(state_dir).withColumn("_found", F.lit(1))
    seeds = F.array(*[F.lit(j) for j in range(k)])
    probe = keys.select(key_col, F.explode(seeds).alias("j")).select(
        key_col, seeded_bucket(F.col(key_col), F.col("j"), m).alias("bit")
    )
    return (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy(key_col)
        .agg(
            (F.sum(F.coalesce(F.col("_found"), F.lit(0))) == k).alias("maybe_member")
        )
    )

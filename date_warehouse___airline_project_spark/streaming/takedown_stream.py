"""Streaming takedown — the compliance ingest path for BOTH persisted
artifacts.

Batch takedown is complete on the ANN index (``ivf_stream.
remove_from_ivf_index``) and the corpus release (``plans.training_data.
apply_takedown_to_shards``); a real right-to-be-forgotten pipeline
consumes a takedown *stream* (a legal-hold queue, a user-deletion
outbox) and must apply each request exactly once per artifact. This
module runs those two batch operators as Structured Streaming
``foreachBatch`` consumers of an id feed.

Idempotence discipline: both batch operators are idempotent by
construction (re-running with the same list removes 0 rows / rewrites 0
shards), so AT-LEAST-ONCE redelivery can never corrupt the artifact —
the progress guard exists to skip the *cost* of a redelivered rewrite,
not for correctness. Progress is an ascii ``_takedown_progress`` file
inside the artifact dir, committed via tmp + ``os.replace`` AFTER the
rewrite lands; a crash between rewrite and progress write just means
one harmless idempotent re-apply on restart. Same driver-local-commit
caveat as every protocol in this package: guarded by
``_require_local_path``.

Reference basis: the reference's streaming tier consumes per-row
messages off an outbox→Kafka loop (backend/supabaseWatcher.js:36-63,
kafkaworker.js:35-44); this applies that consume-and-apply shape to
deletion requests against the shipped artifacts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .ivf_stream import _require_local_path, remove_from_ivf_index

_PROGRESS_FILE = "_takedown_progress"


def _last_takedown_batch(path: str) -> int:
    p = os.path.join(path, _PROGRESS_FILE)
    if os.path.exists(p):
        with open(p, encoding="ascii") as f:
            return int(f.read().strip())
    return -1


def _record_takedown_batch(path: str, batch_id: int) -> None:
    tmp = os.path.join(path, f".{_PROGRESS_FILE}-tmp")
    with open(tmp, "w", encoding="ascii") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(path, _PROGRESS_FILE))


def apply_ivf_takedown_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
) -> int:
    """One takedown micro-batch against a persisted IVF/IVF-PQ index.
    Returns rows removed (0 for a skipped redelivery or an empty batch).
    The removal itself is the batch operator — marker-protocol atomic,
    codes deleted with their rows on a PQ index."""
    path = _require_local_path(path, spark)
    if batch_id <= _last_takedown_batch(path):
        return 0  # redelivered batch — rewrite already applied
    n = remove_from_ivf_index(spark, path, batch_df, id_col=id_col)
    _record_takedown_batch(path, batch_id)
    return n


def apply_shard_takedown_batch(
    spark: SparkSession,
    out_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str | None = None,
) -> list[int]:
    """One takedown micro-batch against written release shards. Returns
    the rewritten shard ids ([] for a skipped redelivery). Only shards
    containing a listed doc are rewritten — a micro-batch-sized request
    touches a micro-batch-sized set of files, never the whole release.
    When ``state_path`` is given, the persisted release STATE drops the
    ids too (``apply_takedown_to_release_state``) so the docs cannot
    resurrect at the next incremental fold — the two removals are each
    idempotent, so a crash between them re-applies harmlessly on
    redelivery."""
    from ..plans.training_data import apply_takedown_to_shards
    from .release_stream import apply_takedown_to_release_state

    out_dir = _require_local_path(out_dir, spark)
    if batch_id <= _last_takedown_batch(out_dir):
        return []
    changed = apply_takedown_to_shards(spark, out_dir, takedown_ids=batch_df)
    if state_path is not None:
        apply_takedown_to_release_state(spark, state_path, batch_df)
    _record_takedown_batch(out_dir, batch_id)
    return changed


def run_ivf_takedown_stream(
    ids: DataFrame,
    path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    available_now: bool = True,
):
    """Consume a stream of vector ids and delete each batch from the
    persisted index. Returns the StreamingQuery."""
    path = _require_local_path(path, ids.sparkSession)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_ivf_takedown_batch(
            batch_df.sparkSession, path, batch_df, batch_id, id_col
        )

    writer = (
        ids.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_shard_takedown_stream(
    ids: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    state_path: str | None = None,
):
    """Consume a stream of doc ids and surgically remove each batch from
    the written release shards (and, when ``state_path`` is given, from
    the persisted release state — no resurrection at the next fold).
    Returns the StreamingQuery."""
    out_dir = _require_local_path(out_dir, ids.sparkSession)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_shard_takedown_batch(
            batch_df.sparkSession, out_dir, batch_df, batch_id, state_path
        )

    writer = (
        ids.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

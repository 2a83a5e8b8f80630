"""Shared persistent-state-table discipline for incremental streaming
maintenance (Count-Min cells, continuous aggregates).

One pattern, two invariants:

  * **Atomic swap-in.** New state is fully written to a ``.tmp-*`` sibling,
    then renamed live (the previous state renamed aside first). A crash can
    leave a brief no-live-dir window but never partial data;
    ``recover_state`` repairs that window at start and inside every batch
    by restoring the newest ``.old-*`` backup and sweeping stale siblings.
  * **Idempotent fold.** foreachBatch is AT-LEAST-ONCE and a sum/merge fold
    is not idempotent, so the last-applied ``batch_id`` is written INSIDE
    the state dir in the same swap; a redelivered batch id is skipped.

This is the parquet-directory emulation of what a transactional table
format gives natively (``sources/merge_target.py`` has the same split):
with Delta present, ``fold_into_state`` becomes a single ``MERGE INTO``
keyed on the state key and the batch-id guard moves to ``txnAppId``/
``txnVersion`` idempotent writes. At 100 TB the state table additionally
partitions by a coarse time key so a batch rewrites only dirty partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_BATCH_ID_FILE = "_last_batch_id"  # underscore-prefixed: parquet readers skip it


def last_applied_batch_id(state_dir: str) -> int:
    """Batch id folded into the current state, -1 if none/absent."""
    path = os.path.join(state_dir, _BATCH_ID_FILE)
    if os.path.exists(path):
        with open(path, encoding="ascii") as f:
            return int(f.read().strip())
    return -1


def recover_state(state_dir: str) -> None:
    """Repair the swap after a crash and sweep stale siblings.

    Crash window between ``rename(state_dir, old)`` and
    ``rename(tmp, state_dir)`` leaves NO live state dir — without
    recovery the next batch would take the 'no state' branch and
    silently restart the state from empty while the checkpoint still
    marks earlier batches done. Restore the newest backup (always a
    consistent pre-batch state; the interrupted batch redelivers and
    re-applies on top), then delete every leftover ``.tmp-*``/``.old-*``.
    """
    parent = os.path.dirname(state_dir) or "."
    base = os.path.basename(state_dir)
    if not os.path.isdir(parent):
        return
    sibs = [os.path.join(parent, n) for n in os.listdir(parent)]
    olds = [p for p in sibs if os.path.basename(p).startswith(f"{base}.old-")]
    tmps = [p for p in sibs if os.path.basename(p).startswith(f"{base}.tmp-")]
    if not os.path.exists(state_dir) and olds:
        newest = max(olds, key=os.path.getmtime)
        os.rename(newest, state_dir)
        olds.remove(newest)
    for p in olds + tmps:
        shutil.rmtree(p, ignore_errors=True)


def fold_into_state(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    batch_cells: DataFrame,
    merge: Callable[[DataFrame, DataFrame], DataFrame],
) -> None:
    """Fold one micro-batch's pre-aggregated relation into the state table.

    ``merge(state, batch_cells)`` must be the associative combine (keyed
    sum for counts/partial sums, register MAX for HLL-style state, ...).
    Skips already-applied batch ids; swaps the merged table in atomically
    with the batch id recorded in the same swap.
    """
    recover_state(state_dir)  # repair a mid-stream swap crash too
    if batch_id <= last_applied_batch_id(state_dir):
        return  # at-least-once redelivery of an already-folded batch
    if os.path.exists(state_dir):
        merged = merge(spark.read.parquet(state_dir), batch_cells)
    else:
        merged = batch_cells
    swap_in_state(state_dir, batch_id, merged)


def swap_in_state(state_dir: str, batch_id: int, merged: DataFrame) -> None:
    """Atomically replace the state table with ``merged`` and record
    ``batch_id`` in the same swap. ``merged`` may lazily READ the live
    ``state_dir`` — it is fully materialized into the ``.tmp-*`` sibling
    before any rename touches the live dir."""
    tmp = f"{state_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _BATCH_ID_FILE), "w", encoding="ascii") as f:
        f.write(str(batch_id))
    if os.path.exists(state_dir):
        old = f"{state_dir}.old-{uuid.uuid4().hex[:8]}"
        os.rename(state_dir, old)
        os.rename(tmp, state_dir)
        shutil.rmtree(old)
    else:
        os.rename(tmp, state_dir)

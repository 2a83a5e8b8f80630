"""Streaming IVF index maintenance — the ingest path of the ANN stack.

The batch lifecycle (``operators/similarity.py``: ``save_ivf_index`` →
``append_to_ivf_index`` → ``ivf_cell_drift``) assumes someone runs the
append; in production that someone is the ingest stream. Here the same
frozen-codebook assignment runs as a Structured Streaming ``foreachBatch``
loop over a vector feed (file drop / outbox projection / Kafka — the plan
is source-agnostic, like every stream in this package).

Idempotence discipline: ``foreachBatch`` is AT-LEAST-ONCE and a parquet
APPEND is not idempotent, so each micro-batch lands in its own
``<path>/appends/batch=<id>`` directory — written to a ``.tmp-*`` sibling
and RENAMED live, so a batch directory either fully exists (applied;
redelivery is a no-op by presence check) or not at all. A crash mid-write
leaves only a ``.tmp-*`` orphan, swept by ``recover_appends`` at stream
start — never a partial batch visible to readers. This is the
directory-per-transaction emulation of a transactional format's
``txnAppId``/``txnVersion`` idempotent append (``state_table.py`` has the
same note for folded state).

Inside each batch directory the rows stay partitioned by ``centroid_id``,
so probe-side partition pruning works across base + appends alike; the
accumulated small per-batch files are exactly what
``sources.sinks.compact_parquet`` reclaims per cell, after which the
batch dirs fold into the base assignments.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def recover_appends(path: str) -> None:
    """Sweep orphaned ``.tmp-*`` batch writes (crash between write and
    rename). Completed ``batch=*`` dirs are never touched."""
    adir = f"{path}/appends"
    if not os.path.isdir(adir):
        return
    for name in os.listdir(adir):
        if name.startswith(".tmp-"):
            shutil.rmtree(os.path.join(adir, name), ignore_errors=True)


def apply_ivf_append_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign one micro-batch of new vectors against the SAVED codebook
    (frozen — identical to ``append_to_ivf_index``'s contract, pinned by
    the stream-equals-batch test) and land it atomically as
    ``appends/batch=<batch_id>``. Re-applying an existing batch id is a
    no-op; an empty batch writes nothing (nothing to guard — the
    checkpoint already owns source progress)."""
    from ..operators.similarity import assign_to_centroids

    bdir = f"{path}/appends/batch={batch_id}"
    if os.path.exists(bdir):
        return  # redelivered batch — already fully applied
    rows = batch_df.select(id_col, vec_col)
    if rows.isEmpty():
        return
    cents = spark.read.parquet(f"{path}/codebook")
    assigned = assign_to_centroids(
        rows.repartition(spark.sparkContext.defaultParallelism),
        cents,
        id_col,
        vec_col,
        impl="arrow",
    )
    tmp = f"{path}/appends/.tmp-{batch_id}-{uuid.uuid4().hex[:8]}"
    (
        assigned.select(id_col, "centroid_id")
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(tmp)
    )
    os.rename(tmp, bdir)


def ivf_assignments_with_appends(spark: SparkSession, path: str) -> DataFrame:
    """The index's full (id, centroid_id) relation: base assignments plus
    every applied streaming batch. Both sides stay partitioned by
    ``centroid_id``, so a probe's partition filter prunes base and append
    files alike."""
    base = spark.read.parquet(f"{path}/assignments")
    adir = f"{path}/appends"
    if not os.path.isdir(adir) or not any(
        n.startswith("batch=") for n in os.listdir(adir)
    ):
        return base
    appends = spark.read.parquet(adir).select(*base.columns)
    return base.unionByName(appends)


def ivf_cell_drift_streamed(
    spark: SparkSession, path: str, retrain_threshold: float = 0.25
) -> DataFrame:
    """``ivf_cell_drift`` over a stream-maintained index: live counts come
    from base + applied append batches; the training-time baseline and the
    retrain rule are identical to the batch operator (full outer, so a
    cell populated only by streamed appends still surfaces)."""
    stats = spark.read.parquet(f"{path}/cell_stats")
    cur = (
        ivf_assignments_with_appends(spark, path)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n_current"))
    )
    added = F.col("n_current") - F.col("n_train")
    frac = F.when(F.col("n_train") > 0, added.cast("double") / F.col("n_train"))
    return (
        stats.join(cur, "centroid_id", "full")
        .na.fill({"n_current": 0, "n_train": 0})
        .select(
            "centroid_id",
            "n_train",
            "n_current",
            added.alias("n_added"),
            F.round(frac, 6).alias("added_frac"),
            F.when((F.col("n_train") == 0) & (added > 0), 1)
            .when(frac > retrain_threshold, 1)
            .otherwise(0)
            .alias("retrain_flag"),
        )
        .orderBy("centroid_id")
    )


def run_ivf_append_stream(
    new_vectors: DataFrame,
    path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Maintain a persisted IVF index off a stream of new vectors.
    Returns the StreamingQuery."""
    recover_appends(path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_ivf_append_batch(
            batch_df.sparkSession, path, batch_df, batch_id, id_col, vec_col
        )

    writer = (
        new_vectors.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

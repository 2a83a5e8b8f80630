"""Sinks (SURVEY §2.1 S3/S4/S5/S12).

``write_quarantine_csv`` mirrors the reference's quarantine export
(cleaning.py:771-779): nulls as empty strings, header always written even
for zero rows.

``safe_upsert`` reproduces the upsert→insert→skip fallback ladder
(cleaning.py:165-199) against parquet paths (no Delta jars in this image;
with Delta this is a single ``MERGE INTO``). Upsert = key-based anti-join
merge: last write wins per key. The format-agnostic seam lives in
``sources.merge_target`` (``make_merge_target`` → Delta when available,
this parquet emulation otherwise); prefer it in new code.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_quarantine_csv(df: DataFrame, path: str) -> None:
    """Single-CSV quarantine export, BYTE-identical to the reference's
    pandas export (cleaning.py:771-779):

      * non-empty → ``fillna('').to_csv(index=False, encoding='utf-8-sig')``
        — UTF-8 BOM, header, nulls as empty fields, embedded quotes
        doubled (csv.QUOTE_MINIMAL), '\\n' line ends, trailing newline;
      * empty → ``pd.DataFrame().to_csv(index=False)`` — a single '\\n',
        no header, no BOM (the reference drops the columns too).

    coalesce(1) is intentional: quarantine sets are small by contract
    (they're the anomaly tail); the clean side never funnels through one
    partition.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    out = df.na.fill("").coalesce(1)
    (
        out.write.mode("overwrite")
        .option("header", True)
        # pandas doubles embedded quotes (doublequote=True); Spark's
        # default escape is backslash — pin escape='"' for byte parity
        .option("escape", '"')
        # Spark writes empty strings as a quoted "" by default; pandas
        # writes an empty field
        .option("emptyValue", "")
        # Spark's writer trims cell whitespace by default; pandas doesn't
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path + ".tmp")
    )
    part = next(
        f for f in os.listdir(path + ".tmp") if f.startswith("part-") and f.endswith(".csv")
    )
    part_path = os.path.join(path + ".tmp", part)
    if os.path.getsize(part_path) == 0 or df.isEmpty():
        # reference's empty branch: a column-less to_csv -> exactly b"\n"
        with open(path, "wb") as f:
            f.write(b"\n")
    else:
        # utf-8-sig: prepend the BOM while promoting the part file
        with open(path, "wb") as dst, open(part_path, "rb") as src:
            dst.write(b"\xef\xbb\xbf")
            shutil.copyfileobj(src, dst)
    shutil.rmtree(path + ".tmp")


def append_log(spark: SparkSession, path: str, rows: list[dict]) -> None:
    """Append-only log-table write (etl_file_logs / etl_process_logs /
    pipeline_run_log shape, cleaning.py:88-121)."""
    if not rows:
        return
    spark.createDataFrame(rows).write.mode("append").parquet(path)


def safe_upsert(df: DataFrame, path: str, key: list[str]) -> str:
    """Upsert df into the parquet table at ``path`` on ``key``.

    Returns the outcome tag ('upserted' | 'inserted') mirroring the
    reference's fallback ladder. New data wins on key collision.
    """
    spark = df.sparkSession
    # per-key uniqueness holds within the batch too (kept row arbitrary)
    df = df.dropDuplicates(list(key))
    if not os.path.exists(path):
        df.write.mode("overwrite").parquet(path)
        return "inserted"
    try:
        existing = spark.read.parquet(path)
        merged = existing.join(df.select(key), key, "left_anti").unionByName(
            df, allowMissingColumns=True
        )
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        shutil.move(tmp, path)
        return "upserted"
    except Exception:
        # fallback: plain append (reference's insert-on-upsert-failure)
        df.write.mode("append").parquet(path)
        return "inserted"


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Write a training-export sharded corpus: rows land in
    ``<path>/shard=<s>/`` ordered by their deterministic in-shard position
    (the hash-shuffle contract of
    plans/training_data.py::doc_shard_export_assignment).

    Co-location before the partitioned write, same discipline as the IVF
    index write (operators/similarity.py::save_ivf_index): repartition on
    the shard key so each shard is written by one task as one run of
    files, then sortWithinPartitions fixes the in-file row order —
    without the exchange every input task would write a sliver into
    every shard dir (tasks × shards small files). At 100 TB the same
    plan holds with shuffle-partitions ≥ n_shards; shards write in
    parallel and readers stream one dir per worker.
    """
    from ..functions.hashing import hash56

    h = df.withColumn("_h56", hash56(F.col(id_col)))
    sharded = h.withColumn("shard", (F.col("_h56") % n_shards).cast("bigint"))
    (
        # sort leads with the partition column: the dynamic-partition writer
        # requires rows ordered by its partition cols and would re-sort (NOT
        # stably) if the child ordering didn't already satisfy that prefix
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_h56", id_col)
        .drop("_h56")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE-style small-file compaction: rewrite a parquet directory
    into ``ceil(total_bytes / target_file_bytes)`` files (>=1) and swap
    the result in atomically. Returns the new file count.

    Small files are the silent killer of scan throughput at 100 TB: every
    file costs a task, a footer read, and an open — a table ingested by
    many streaming micro-batches degrades until compacted. Production
    systems run this per table-partition under a transactional commit
    (Delta/Iceberg OPTIMIZE); this is the parquet emulation with the
    repo's tmp-write → backup-rename → swap discipline
    (sources/merge_target.py), so readers see either the old layout or
    the new one, never a partial directory. Row content is preserved
    exactly; intra-file order is not a contract (layout-only operation).

    The size estimate reads filesystem metadata only — no data pass
    beyond the single rewrite itself, which is one coalesce (no shuffle).
    """
    import math

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: merging splits needs no shuffle
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def backfill_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Backfill: overwrite ONLY the table partitions present in ``df``,
    leaving every other partition untouched (dynamic partition overwrite).

    The operational pattern behind every logic fix over a date-partitioned
    100 TB table: recompute the affected date range and swap just those
    directories — static overwrite mode would drop the whole table, and
    append mode would duplicate the range. Idempotent per partition: re-
    running the same backfill converges to the same state.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )

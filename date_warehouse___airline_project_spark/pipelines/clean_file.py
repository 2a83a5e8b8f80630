"""End-to-end ``clean_file`` driver — the reference's main ETL entry point
(SURVEY §3.1: upload → extract → dispatch-by-type → clean → upsert staging
+ quarantine CSV + run logs), collapsed into one Spark job.

What disappears vs the reference: the Node→Python child process, the 2 s
PostgREST schema-cache sleep, and the per-call REST round-trips — the
pipeline is one lazy plan from CSV scan to the two sinks; Catalyst owns
planning.

Staging table names mirror server.js:33-39 (including the multi-source
fact name for travel-agency transactions).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..sources.csv import read_csv_all_string
from ..sources.sinks import append_log, safe_upsert, write_quarantine_csv
from .cleaners import (
    clean_airlines,
    clean_airlinesales,
    clean_airports,
    clean_flights,
    clean_passengers,
    clean_transactions,
)

# server.js:33-39 staging map
STAGING_TABLES = {
    "airlines": "staging_airlines",
    "airports": "staging_airports",
    "flights": "staging_flights",
    "passengers": "staging_passengers",
    "transactions": "staging_facttravelagencysales_source2_agency",
    "airlinesales": "staging_airline_sales",
}

UPSERT_KEYS = {
    "airlines": ["airlinekey"],
    "airports": ["airportkey"],
    "flights": ["flightkey"],
    "passengers": ["passengerkey"],
    "transactions": ["transactionid"],
    "airlinesales": ["transactionid"],
}


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


def _staging(spark: SparkSession, root: str, name: str, fallback_cols: list[str]) -> DataFrame:
    """Load a staging table if it exists, else an empty frame with the
    expected key column (lets flights clean before dims are loaded —
    everything quarantines as invalid-prefix/airport, same as the
    reference's empty-dim behavior)."""
    path = os.path.join(root, name)
    if os.path.exists(path):
        return spark.read.parquet(path)
    schema = ", ".join(f"{c} string" for c in fallback_cols)
    return spark.createDataFrame([], schema)


def clean_file(
    spark: SparkSession,
    file_path: str,
    file_type: str,
    staging_root: str,
    quarantine_dir: str,
    log_root: str | None = None,
) -> dict:
    """Run the full clean pipeline for one uploaded CSV; returns the run
    summary (the JSON the reference's endpoint replies with)."""
    if file_type not in STAGING_TABLES:
        raise ValueError(f"unknown file_type {file_type!r}; expected {sorted(STAGING_TABLES)}")
    t0 = time.time()
    steps: list[dict] = []

    def log_step(name: str, status: str, **details) -> None:
        steps.append(
            {"step_name": name, "ts": _now(), "status": status, "details": repr(details)}
        )

    df = read_csv_all_string(spark, file_path)
    rows_in = df.count()
    log_step("EXTRACT", "SUCCESS", rows=rows_in)

    if file_type == "airlines":
        clean, quar = clean_airlines(df)
    elif file_type == "airports":
        clean, quar = clean_airports(df)
    elif file_type == "flights":
        airlines = _staging(spark, staging_root, STAGING_TABLES["airlines"], ["airlinekey"])
        airports = _staging(spark, staging_root, STAGING_TABLES["airports"], ["airportkey"])
        clean, quar = clean_flights(df, airlines, airports)
    elif file_type == "passengers":
        clean, quar = clean_passengers(df)
    elif file_type == "transactions":
        clean, quar = clean_transactions(df)
    else:
        clean, quar = clean_airlinesales(df)

    staging_table = STAGING_TABLES[file_type]
    outcome = safe_upsert(
        clean, os.path.join(staging_root, staging_table), UPSERT_KEYS[file_type]
    )
    rows_clean = clean.count()
    log_step("LOAD_STAGING", "SUCCESS", outcome=outcome, rows=rows_clean)

    quar_path = os.path.join(quarantine_dir, f"quarantined_{file_type}.csv")
    write_quarantine_csv(quar, quar_path)
    rows_quar = quar.count()
    log_step("QUARANTINE_EXPORT", "SUCCESS", rows=rows_quar)

    summary = {
        "status": "success",
        "file": os.path.basename(file_path),
        "file_type": file_type,
        "staging_table": staging_table,
        "rows_in": rows_in,
        "rows_clean": rows_clean,
        "rows_quarantined": rows_quar,
        "quarantine_csv": quar_path,
        "elapsed_sec": round(time.time() - t0, 3),
    }
    if log_root:
        append_log(
            spark,
            os.path.join(log_root, "etl_file_logs"),
            [
                {
                    "file_name": summary["file"],
                    "file_size": os.path.getsize(file_path),
                    "upload_time": _now(),
                    "status": "processed",
                    "message": f"clean={rows_clean} quarantined={rows_quar}",
                }
            ],
        )
        append_log(spark, os.path.join(log_root, "etl_process_logs"), steps)
    return summary

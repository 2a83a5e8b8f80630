"""Testdata catalog: the driver-generated TPC-H-ish star schema.

Tables live as one parquet file per table under ``/root/testdata/sf*/``.
Parquet scans get Catalyst predicate pushdown + column pruning for free;
at 100 TB these would be partitioned/ bucketed Delta tables, but the scan
API is identical (``spark.read.parquet`` on a directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough (at any SF — they scale sublinearly or are capped)
# to broadcast in joins against the big facts.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` whose ``ts`` is parquet TIMESTAMP(NANOS).

    Spark has no nanosecond timestamp type; we read nanos as raw int64
    (``legacy.parquet.nanosAsLong`` — set here, not just in our session
    factory, so the query also works under an externally-created session)
    and truncate to microseconds, which matches DuckDB's ns→µs cast.
    Integer DIV, not ``/``: epoch-nanos ≈ 1.7e18 exceeds double precision.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can be written in SQL."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)

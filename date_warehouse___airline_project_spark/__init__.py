"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference airline data-warehouse project
(Data-Warehouse-Final-Project/Date-Warehouse---Airline-Project).

Architecture: idiomatic Spark — DataFrame/SQL logical plans optimized by
Catalyst, Tungsten codegen execution, Structured Streaming for the CDC /
Kafka-shaped paths. Nothing here ports the reference's pandas/Node code;
we re-express WHAT it computes (see SURVEY.md) Spark-first.

Layout:
  session      SparkSession factory tuned for local[N] testing + cluster scale
  sources      CSV/parquet scans, header-derived schemas, sinks (quarantine, safe_write)
  functions    scalar function library (strings, dates, math, json, keys)
  operators    reusable dataflow operators (validity split, dedup, fuzzy join,
               SCD2 merge, ingest order/ffill, text analysis, minhash/simhash,
               similarity search)
  pipelines    the six reference cleaning pipelines + eligibility query
  streaming    Structured Streaming eligibility pipeline (outbox→kafka→worker shape)
  plans        query registry: every operator exposed as (spark_fn, oracle_sql)
"""

__version__ = "0.1.0"

"""Query registry.

Every operator the engine claims (SURVEY.md §2) is registered here as a
named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle. The driver
runs both sides at sf0.01 and hash-compares sorted values, so:

  * every computed column is aliased identically on both sides
  * float aggregates are computed in DECIMAL or rounded identically
  * timestamps are emitted as formatted strings (duckdb is UTC-naive,
    Spark session TZ is pinned UTC — strings sidestep epoch encoding)
  * every ORDER-sensitive result carries a unique tiebreak key
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco

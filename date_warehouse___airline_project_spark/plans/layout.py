"""Data-layout effectiveness accounting: does the Morton/z-order
clustered layout (sources/zorder.py) actually let a rectangle predicate
skip files?

Parquet scans prune files/row-groups from min-max footer stats, so the
value of a layout is exactly "what fraction of files can a selective
filter skip". This query simulates both layouts ON THE SAME ROWS with
pure column arithmetic — every z-bucket (or linear date-bucket) stands
in for one file, per-bucket min/max for its footer stats — and reports
scanned-file fractions for a 2-D rectangle predicate under each layout.
The point the numbers make is the z-order sales pitch: a date-sorted
(linear) layout prunes on date only and scans EVERY file for the
custkey half of the predicate, while the Morton layout keeps both
dimensions' ranges tight and prunes on both.

Everything is integer arithmetic off one bounds row (exact under any
partitioning, replicated verbatim in the oracle), one scan to bucket
rows, and bucket-count-bounded reduces — nothing here grows with
corpus size except the single bucketing scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.zorder import morton_code
from .registry import query

_BITS = 4  # 16 buckets per dimension -> 256 z-cells ("files")
_NB = 1 << _BITS
_NLIN = _NB * _NB  # linear layout gets the same file count


def _mk_morton_sql(xb: str, yb: str) -> str:
    terms = []
    for b in range(_BITS):
        terms.append(f"(({xb} // {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"(({yb} // {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


_ZSKIP_ORACLE = f"""
    WITH b AS (
      SELECT MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax,
             MIN(DATEDIFF('day', DATE '1970-01-01', o_orderdate)) AS dmin,
             MAX(DATEDIFF('day', DATE '1970-01-01', o_orderdate)) AS dmax
      FROM orders),
    r AS (
      SELECT o_custkey AS c,
             DATEDIFF('day', DATE '1970-01-01', o_orderdate) AS d,
             b.cmin, b.cmax, b.dmin, b.dmax
      FROM orders, b),
    bk AS (
      SELECT c, d, cmin, cmax, dmin, dmax,
             LEAST({_NB - 1}, ((c - cmin) * {_NB}) // (cmax - cmin + 1)) AS bx,
             LEAST({_NB - 1}, ((d - dmin) * {_NB}) // (dmax - dmin + 1)) AS by,
             LEAST({_NLIN - 1}, ((d - dmin) * {_NLIN}) // (dmax - dmin + 1)) AS lb
      FROM r),
    z AS (SELECT *, {_mk_morton_sql('bx', 'by')} AS zb FROM bk),
    pred AS (
      SELECT cmin + (3 * (cmax - cmin)) // 8 AS clo,
             cmin + (5 * (cmax - cmin)) // 8 AS chi,
             dmin + (3 * (dmax - dmin)) // 8 AS dlo,
             dmin + (5 * (dmax - dmin)) // 8 AS dhi
      FROM b),
    zf AS (
      SELECT zb, MIN(c) AS fc_min, MAX(c) AS fc_max,
                 MIN(d) AS fd_min, MAX(d) AS fd_max
      FROM z GROUP BY zb),
    lf AS (
      SELECT lb, MIN(c) AS fc_min, MAX(c) AS fc_max,
                 MIN(d) AS fd_min, MAX(d) AS fd_max
      FROM z GROUP BY lb),
    zs AS (
      SELECT COUNT(*) AS n_files,
             CAST(SUM(CASE WHEN fc_max >= clo AND fc_min <= chi
                            AND fd_max >= dlo AND fd_min <= dhi
                      THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned
      FROM zf, pred),
    ls AS (
      SELECT COUNT(*) AS n_files,
             CAST(SUM(CASE WHEN fc_max >= clo AND fc_min <= chi
                            AND fd_max >= dlo AND fd_min <= dhi
                      THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned
      FROM lf, pred)
    SELECT 'linear_date' AS layout, n_files, files_scanned,
           ROUND(100.0 * (n_files - files_scanned) / n_files, 2) AS skip_pct
    FROM ls
    UNION ALL
    SELECT 'zorder' AS layout, n_files, files_scanned,
           ROUND(100.0 * (n_files - files_scanned) / n_files, 2) AS skip_pct
    FROM zs
    ORDER BY layout
"""


@query(
    "zorder_skipping_effectiveness",
    oracle=_ZSKIP_ORACLE,
    doc="File-skipping effectiveness of the Morton/z-order layout "
    "(sources/zorder.py::morton_code — the SAME bit-interleave the "
    "clustered writer uses) vs a date-sorted linear layout, for a 2-D "
    "rectangle predicate (middle-quarter custkey x middle-quarter "
    "orderdate). Buckets stand in for files, per-bucket min/max for "
    "parquet footer stats; a file is scanned iff its stats rectangle "
    "intersects the predicate. Integer-exact bucketing off ONE bounds "
    "row; corpus-scale work is a single bucketing scan + two "
    "bucket-count-bounded reduces.",
)
def zorder_skipping_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rows = o.select(
        F.col("o_custkey").alias("c"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01")).alias("d"),
    )
    b = rows.agg(
        F.min("c").alias("cmin"),
        F.max("c").alias("cmax"),
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
    )
    # 1-row bounds attach (allowlisted broadcast scalar)
    r = rows.crossJoin(F.broadcast(b))
    bx = F.least(
        F.lit(_NB - 1),
        F.floor(
            ((F.col("c") - F.col("cmin")) * _NB)
            / (F.col("cmax") - F.col("cmin") + 1)
        ),
    ).cast("long")
    by = F.least(
        F.lit(_NB - 1),
        F.floor(
            ((F.col("d") - F.col("dmin")) * _NB)
            / (F.col("dmax") - F.col("dmin") + 1)
        ),
    ).cast("long")
    lb = F.least(
        F.lit(_NLIN - 1),
        F.floor(
            ((F.col("d") - F.col("dmin")) * _NLIN)
            / (F.col("dmax") - F.col("dmin") + 1)
        ),
    ).cast("long")
    z = r.select(
        "c",
        "d",
        "cmin",
        "cmax",
        "dmin",
        "dmax",
        morton_code([bx, by], _BITS).alias("zb"),
        lb.alias("lb"),
    )
    clo = F.col("cmin") + F.floor((3 * (F.col("cmax") - F.col("cmin"))) / 8)
    chi = F.col("cmin") + F.floor((5 * (F.col("cmax") - F.col("cmin"))) / 8)
    dlo = F.col("dmin") + F.floor((3 * (F.col("dmax") - F.col("dmin"))) / 8)
    dhi = F.col("dmin") + F.floor((5 * (F.col("dmax") - F.col("dmin"))) / 8)

    def layout_stats(bucket_col: str, label: str) -> DataFrame:
        files = z.groupBy(bucket_col).agg(
            F.min("c").alias("fc_min"),
            F.max("c").alias("fc_max"),
            F.min("d").alias("fd_min"),
            F.max("d").alias("fd_max"),
            # bounds are constant columns; carry them through the reduce
            F.min("cmin").alias("cmin"),
            F.min("cmax").alias("cmax"),
            F.min("dmin").alias("dmin"),
            F.min("dmax").alias("dmax"),
        )
        scanned = (
            (F.col("fc_max") >= clo)
            & (F.col("fc_min") <= chi)
            & (F.col("fd_max") >= dlo)
            & (F.col("fd_min") <= dhi)
        )
        return files.agg(
            F.lit(label).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.when(scanned, 1).otherwise(0)).alias("files_scanned"),
        ).select(
            "layout",
            "n_files",
            "files_scanned",
            F.round(
                100.0 * (F.col("n_files") - F.col("files_scanned")) / F.col("n_files"),
                2,
            ).alias("skip_pct"),
        )

    return (
        layout_stats("lb", "linear_date")
        .unionByName(layout_stats("zb", "zorder"))
        .orderBy("layout")
    )

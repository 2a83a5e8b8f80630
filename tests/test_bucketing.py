"""Bucketed-table co-located join: writing both join sides bucketed on the
join key lets Spark plan the join WITHOUT a shuffle exchange — the
pre-partitioning is the 100 TB strategy for repeated fact-fact joins
(SURVEY §4: "bucketing for co-located joins")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # managed tables land in the session's spark-warehouse dir (static
    # conf — can't be redirected per-test); DROP TABLE below removes them
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, lineitem = bucketed
    # disable broadcast so the planner must choose a key-distributed join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must consume bucketed outputs directly: no
        # exchange between the scans and the join (the only exchange is
        # the one for the final small aggregation)
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # and the result is right
        n = joined.agg(F.sum("n")).collect()[0][0]
        assert n == lineitem.count()  # every lineitem matched its order
        del join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucket_pruning_on_key_filter(spark, bucketed):
    orders, _ = bucketed
    # equality filter on the bucket key scans ONE bucket of 8. The planner
    # auto-disables bucketed scans when no operator consumes the
    # distribution, so pin it on for the pruning demonstration.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            orders.filter(F.col("o_orderkey") == 42)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def test_partitioned_parquet_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy(year) layout: a year-filtered read must prune
    to that partition's files at PLANNING time (PartitionFilters, not a
    post-scan filter) — the 100 TB strategy for date-ranged fact scans."""
    path = str(tmp_path / "orders_by_year")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(path)
    )

    rd = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters", 1)[1][:200]

    expect = orders.filter(F.year("o_orderdate") == 1996).count()
    assert rd.count() == expect

    # Pruned scan reads only the one partition directory.
    import glob
    all_files = glob.glob(f"{path}/o_year=*/*.parquet")
    files_1996 = glob.glob(f"{path}/o_year=1996/*.parquet")
    assert len(files_1996) > 0 and len(files_1996) < len(all_files)


def test_zorder_write_tightens_file_stats_on_both_columns(spark, tmp_path):
    # A linear sort on col A leaves per-file min-max spans on col B at
    # ~full range (no pruning possible on B); the Morton layout must keep
    # per-file spans small on BOTH columns. Assert z-order's mean span on
    # the NON-sort column beats the linear layout by a wide margin.
    import glob

    import pandas as pd

    from date_warehouse___airline_project_spark.sources.zorder import zorder_write

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(o, zpath, ["o_custkey", "o_totalprice"], n_files=8)
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def mean_span(path, col):
        spans, glo, ghi = [], None, None
        for f in glob.glob(f"{path}/part-*.parquet"):
            s = pd.read_parquet(f, columns=[col])[col]
            if len(s) == 0:
                continue
            spans.append(float(s.max() - s.min()))
            glo = s.min() if glo is None else min(glo, s.min())
            ghi = s.max() if ghi is None else max(ghi, s.max())
        return (sum(spans) / len(spans)) / float(ghi - glo)

    # linear layout: tight on custkey, ~full-range on totalprice
    assert mean_span(lpath, "o_custkey") < 0.25
    assert mean_span(lpath, "o_totalprice") > 0.8
    # z-order: materially tight on BOTH
    z_cust = mean_span(zpath, "o_custkey")
    z_price = mean_span(zpath, "o_totalprice")
    assert z_cust < 0.6 and z_price < 0.6, (z_cust, z_price)
    assert z_price < 0.75 * mean_span(lpath, "o_totalprice")

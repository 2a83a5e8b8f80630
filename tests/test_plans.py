"""Physical-plan assertions: the queries must not only be correct, they
must compile to the plans a 100 TB deployment needs — explicit broadcasts
for dims, parquet filter pushdown + column pruning, TakeOrderedAndProject
for top-k, codegen'd (not Cartesian) range joins, and no hot-key funnel in
the two-phase distinct aggregation.
"""

from __future__ import annotations

import pytest

from date_warehouse___airline_project_spark.plans import REGISTRY, load_all

load_all()
SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    df.collect()  # finalize AQE so the executed plan is the real one
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_are_broadcast(spark):
    for q in ["q3_top_revenue_orders", "q5_region_nation_revenue"]:
        plan = plan_of(spark, q)
        assert "BroadcastHashJoin" in plan, q
        # the fact table must never be broadcast: the big-side join keeps a
        # shuffle/sort-merge or broadcast where the DIM is the build side
        assert "CartesianProduct" not in plan, q


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read the unused key columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_topk_plans_take_ordered(spark):
    plan = plan_of(spark, "topk_recent_events")
    assert "TakeOrderedAndProject" in plan


def test_range_join_is_codegen_bnlj_not_cartesian(spark):
    import re

    plan = plan_of(spark, "range_join_inflight_shipments")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the join must sit inside a whole-stage-codegen region — the `*(n)`
    # marker — because the interval arithmetic is precomputed and the
    # condition is plain comparisons
    assert re.search(r"\*\(\d+\) BroadcastNestedLoopJoin", plan)


def test_semi_anti_joins_plan_as_such(spark):
    plan = plan_of(spark, "semi_join_customers_with_big_orders")
    assert "LeftSemi" in plan
    plan = plan_of(spark, "anti_join_customers_without_orders")
    assert "LeftAnti" in plan


def test_two_phase_distinct_has_partial_agg(spark):
    plan = plan_of(spark, "distinct_users_two_phase")
    # both phases hash-aggregate; phase 1 must show a partial (map-side)
    # aggregation before its exchange — the skew absorber
    assert plan.count("HashAggregate") >= 4
    assert "Exchange" in plan

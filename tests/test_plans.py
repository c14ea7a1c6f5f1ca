"""Plan-quality regression tests: the physical plans of the headline
queries must keep their scale-critical properties — filters and
projections pushed into the parquet scan, dimension joins broadcast,
no accidental cartesian/sort-merge regressions. A correctness-neutral
refactor that silently loses pushdown fails here, not at 100 TB."""

from __future__ import annotations

import contextlib
import io

import pytest

from hadoop_multiple_streaming_spark import workloads

workloads.load_all()

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = workloads.QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # all four predicates reach the scan
    for frag in ["l_shipdate", "l_discount", "l_quantity"]:
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert any(frag in l for l in pushed), frag


def test_q1_projection_pruned(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read, "no ReadSchema in plan"
    # 7 needed columns only — pruning reached the scan
    assert "l_orderkey" not in read[0] and "l_partkey" not in read[0]
    assert "l_quantity" in read[0] and "l_returnflag" in read[0]


def test_q5_all_joins_broadcast(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q3_joins_broadcast(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_anti_join_is_broadcast(spark):
    plan = plan_of(spark, "anti_join_dormant_customers")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregate_family_partial_combine(spark):
    # the §2.5 plan must show partial (map-side) aggregation
    plan = plan_of(spark, "agg_long_sum")
    assert "HashAggregate" in plan
    assert "partial" in plan.lower()


def test_sql_view_pushdown(spark):
    # the SQL surface plans identically: filters push through temp views
    from hadoop_multiple_streaming_spark.sql import register_tables

    register_tables(spark, SF)
    df = spark.sql(
        "SELECT l_returnflag, count(*) AS c FROM lineitem "
        "WHERE l_quantity < 10 GROUP BY l_returnflag"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert any(
        "l_quantity" in l for l in plan.splitlines() if "PushedFilters" in l
    )

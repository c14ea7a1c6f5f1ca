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


def test_q5_dim_chain_broadcast(spark):
    # the hinted supplier⋈nation⋈region dim chain broadcasts; the
    # fact-scaled orders/customer edges are UNHINTED (Catalyst picks by
    # stats here, SortMergeJoin at scale — see test_plan_scale.py)
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q3_joins_no_cartesian(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "CartesianProduct" not in plan
    # at test SF the stats still pick hash joins for the tiny sides
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_anti_join_type(spark):
    # exclusion set is fact-scaled -> no broadcast hint; join TYPE is
    # the contract (anti), the strategy is Catalyst's to pick
    plan = plan_of(spark, "anti_join_dormant_customers")
    assert "LeftAnti" in plan


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


def test_q8_two_role_dims_broadcast(spark):
    # part and supplier-nation (two nation roles) stay hinted
    # broadcasts; orders/customer edges are unhinted fact joins
    plan = plan_of(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q4_semi_join_type(spark):
    plan = plan_of(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    # the date range reaches the orders scan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("o_orderdate" in l for l in pushed)


def test_q16_anti_join_and_distinct_count(spark):
    plan = plan_of(spark, "q16_supplier_part_counts")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q19_common_conjuncts_pushed(spark):
    # Catalyst extracts brand/size bounds from the OR branches and
    # pushes them below the join into the part scan
    plan = plan_of(spark, "q19_disjunctive_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l or "p_size" in l for l in pushed)
    assert "CartesianProduct" not in plan


def test_q2_window_rides_aggregation_shuffle(spark):
    # the per-part MIN window must NOT add an Exchange beyond the
    # groupBy(p_partkey, ...) aggregation shuffle it rides: exactly ONE
    # p_partkey exchange serves both operators. (The part/supplier
    # joins carry no broadcast hints anymore — SF-scaled, see
    # test_plan_scale — so the compile-time plan may sort-merge them
    # with their own join-key exchanges; that's the correct 100 TB
    # shape, and AQE broadcasts those sides at test SF.)
    plan = plan_of(spark, "q2_min_cost_supplier")
    partkey_shuffles = [
        l
        for l in plan.splitlines()
        if "Arguments: hashpartitioning(p_partkey" in l
    ]
    assert len(partkey_shuffles) == 1, partkey_shuffles


def test_minhash_no_distinct_shuffle(spark):
    # dedup_minhash_lsh must keep exactly 3 shuffles: groupBy(id) for
    # signatures, groupBy(band,bucket), distinct pairs — NOT a 4th for
    # distinct shingles (MinHash is duplicate-invariant)
    plan = plan_of(spark, "dedup_minhash_lsh")
    n_shuffle = sum(
        1 for l in plan.splitlines() if "Arguments: hashpartitioning" in l
    )
    # repartition(32) adds a RoundRobin exchange (scan-parallelism
    # floor); the 3 hash shuffles are sig/bucket/distinct
    assert n_shuffle <= 3, f"unexpected extra shuffle ({n_shuffle} hash shuffles)"


def test_q21_single_fact_exchange(spark):
    # both aggregation levels + the fails branch cluster on ONE
    # orderkey exchange; only downstream small-data shuffles remain
    plan = plan_of(spark, "q21_sole_failing_supplier")
    shuffles = [l for l in plan.splitlines() if "Arguments: hashpartitioning" in l]
    assert len(shuffles) <= 3, shuffles
    okey = [l for l in shuffles if "l_orderkey" in l]
    assert len(okey) >= 1


def test_q22_non_vacuous_on_constructed_data(spark, tmp_path):
    """r14 (VERDICT r13 rotation note): the generated corpus has ~zero
    dormant customers, so q22's driver green matches on EMPTY results
    at both sf0.01 and sf0.1 — vacuous. This pins the query's three
    shapes (scalar-subquery threshold, NOT EXISTS anti-join, rollup)
    against a hand-computed answer on constructed tables where the
    result is NON-empty."""
    from hadoop_multiple_streaming_spark import workloads

    workloads.load_all()
    cust = spark.createDataFrame(
        [
            # (custkey, nationkey, acctbal)
            (1, 1, 900.0),   # dormant, rich, in-list -> KEPT
            (2, 1, 100.0),   # dormant but below avg -> dropped
            (3, 3, 800.0),   # rich but HAS an order -> dropped
            (4, 2, 950.0),   # rich, dormant, nation NOT in list -> dropped
            (5, 5, 700.0),   # dormant, rich, in-list -> KEPT
            (6, 5, -50.0),   # negative balance: excluded from avg, below it
        ],
        "c_custkey long, c_nationkey long, c_acctbal double",
    )
    orders = spark.createDataFrame([(3, 10)], "o_custkey long, o_orderkey long")
    cust.write.parquet(str(tmp_path / "customer.parquet"))
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    rows = {
        (r.cntrycode, r.numcust, float(r.totacctbal))
        for r in workloads.QUERIES["q22_global_sales_opportunity"](
            spark, str(tmp_path)
        ).collect()
    }
    # avg over positive in-list balances = (900+100+800+700)/4 = 625
    # kept: cust 1 (nation 1, 900) and cust 5 (nation 5, 700)
    assert rows == {(1, 1, 900.0), (5, 1, 700.0)}, rows


def test_q11_non_vacuous_on_constructed_data(spark, tmp_path):
    """r15 (self-surfaced by the new OK(EMPTY) sweep flag): q11's
    0.0006-of-total threshold scales with part count, so at sf0.1's
    part cardinality NO part crosses it and the sf0.1 catalog row
    matches on empty — vacuous there (the sf0.01 driver gate is
    non-vacuous). Pin the shape — per-part rollup vs a global scalar
    threshold — against a hand-computed non-empty answer."""
    from hadoop_multiple_streaming_spark import workloads

    workloads.load_all()
    # revenue = extendedprice * (1 - discount); zero discount for hand
    # arithmetic. Totals: part 1 -> 700, part 2 -> 299.5,
    # part 3 -> 0.5; total 1000, threshold 0.0006 * 1000 = 0.6 ->
    # parts 1 and 2 pass, part 3 (0.5 < 0.6) is filtered: the global
    # scalar threshold actually discriminates.
    li = spark.createDataFrame(
        [
            (1, 400.0, 0.0),
            (1, 300.0, 0.0),
            (2, 299.5, 0.0),
            (3, 0.5, 0.0),
        ],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = {
        r.l_partkey
        for r in workloads.QUERIES["q11_important_parts"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows == {1, 2}

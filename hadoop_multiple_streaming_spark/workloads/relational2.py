"""Second tranche of TPC-H-shaped queries: nation-pair volume (Q7),
returned-item reporting (Q10), promo revenue share (Q14), small-
quantity revenue via scalar-aggregate join (Q17), large orders with
HAVING (Q18), and an anti-join cohort (Q22 shape) — completing the
join/subquery patterns a reference user's analyst would expect."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from .relational import _DISC1, _PRICE
from .tables import load


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS revenue
    FROM lineitem, orders, customer, supplier, nation sn, nation cn
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = sn.n_nationkey AND c_nationkey = cn.n_nationkey
      AND sn.n_nationkey < 3 AND cn.n_nationkey < 3
      AND sn.n_nationkey <> cn.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume per year. The nation
    dim appears TWICE (supplier side and customer side) — both
    hint-broadcast (25 rows, fixed). supplier scales with SF (SF x
    10k), so its edge carries no hint: AQE broadcasts when small,
    sort-merge at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("sn_key") < 3)
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cn_key") < 3)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("sn_key") != F.col("cn_key"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("revenue"))


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS revenue,
           c_mktsegment
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by returned-item revenue
    (selective fact filter pushed to the scan, deterministic top-k)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN {_PRICE} * {_DISC1} ELSE CAST(0.00 AS DECIMAL(3,2)) END)
                        AS DOUBLE)
                 / CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue
    share). Both sums stay exact decimals; the one double division at
    the end is deterministic. part scales with SF — no broadcast hint
    (AQE decides at runtime)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.expr(
            f"100.0 * cast(sum(case when p_type = 'PROMO' then {_PRICE} * {_DISC1} "
            f"else cast(0.00 as decimal(3,2)) end) as double) "
            f"/ cast(sum({_PRICE} * {_DISC1}) as double)"
        ).alias("promo_revenue_pct")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly, COUNT(*) AS cnt
    FROM lineitem,
         (SELECT l_partkey AS pk,
                 0.2 * (CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)) AS qty_limit
          FROM lineitem GROUP BY l_partkey) t
    WHERE l_partkey = pk AND l_quantity < qty_limit
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average joined back against the fact
    (the scalar-correlated-subquery pattern, planned as agg + join).
    avg is an exact-integer-sum division so the 0.2x threshold is
    engine-identical. `limits` has one row per partkey — part-scaled,
    so no broadcast hint; at scale this is a sort-merge self-join on
    l_partkey (both sides share the partitioning)."""
    li = load(spark, sf_dir, "lineitem")
    limits = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * (F.sum("l_quantity").cast("double") / F.count(F.lit(1)))).alias(
            "qty_limit"
        )
    )
    joined = li.join(limits, li.l_partkey == limits.pk).where(
        F.col("l_quantity") < F.col("qty_limit")
    )
    return joined.agg(
        F.expr(f"cast(sum({_PRICE}) as double) / 7.0").alias("avg_yearly"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(l_quantity) > 250
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group + HAVING over a join (large-volume
    orders). The integral-quantity sum makes the HAVING threshold
    exact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 250)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
    )


@register(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per group (Spark `percentile` == DuckDB
    quantile_cont: same linear interpolation, verified bit-identical
    at sf0.01 and sf0.1). At 100 TB switch to percentile_approx — the
    exact form buffers each group's values."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # ONE percentile buffer for all three quantiles — three
            # separate percentile(...) aggregates each hold their own
            # copy of every group value (measured 3.7s -> 1.3s at sf0.1)
            F.expr(
                "percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))"
            ).alias("ps"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "l_returnflag",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p90"),
            F.col("ps")[2].alias("p99"),
            "cnt",
        )
    )


@register(
    "anti_join_dormant_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_dormant
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY c_mktsegment
    """,
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface (TPC-H Q22 shape): customers with no recent
    orders, counted per segment. The exclusion set is distinct custkeys
    of recent orders — fact-scaled, so no broadcast hint (shuffle anti
    join on c_custkey; AQE converts it when genuinely small)."""
    cust = load(spark, sf_dir, "customer")
    recent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    dormant = cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    return dormant.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_dormant"))


@register(
    "lineitem_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations in one pass (one Expand
    + single hash aggregation — the same plan ROLLUP gets, with 4
    instead of 3 replicas per row)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "sum_qty",
            "cnt",
        )
    )


@register(
    "orders_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderpriority, '<all>') AS priority,
           COALESCE(o_orderstatus, '<all>') AS status,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind ROLLUP/CUBE):
    (priority, status), (priority), and grand total in ONE pass —
    a single Expand (3 replicas per row) feeding one hash aggregation,
    instead of three separate scans unioned."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "sum_price",
            "cnt",
        )
    )


@register(
    "orders_priority_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: order counts by priority, one column per status.
    With the pivot values listed explicitly Spark skips the extra
    distinct-values job and plans a single conditional aggregation —
    exactly the oracle's CASE columns."""
    orders = load(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    )


@register(
    "events_exact_profile",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def events_exact_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT half of the per-event-type profile: count, distinct
    users, value min/max — no arithmetic on doubles (min/max return
    stored values), so the oracle comparison is bit-exact. The sketch
    half lives in events_approx_profile (rows-only by nature); this
    split gives the profile shape a real value-level check."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register("events_approx_profile")  # rows-only: sketch outputs are
# implementation-defined (HLL++ / KLL), no cross-engine oracle exists
def events_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch surface used at 100 TB where exact forms are
    unaffordable: approx_count_distinct (HLL++, default 5% rsd) and
    percentile_approx (KLL-style, accuracy 10000) per event_type —
    constant memory per group vs the exact forms' full-value buffers
    (events_hourly_rollup / price_percentiles are their exact twins).
    Rows-only check: sketch results are engine-implementation-defined;
    the exact columns are oracle-checked in events_exact_profile."""
    ev = load(spark, sf_dir, "events")
    prof = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.expr("percentile_approx(value, array(0.5D, 0.99D), 10000)").alias(
            "approx_p50_p99"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )
    # project the quantile array to scalar columns: array-typed cells are
    # unhashable in pandas-based comparators (and scalars read better)
    return prof.select(
        "event_type",
        "approx_users",
        F.col("approx_p50_p99")[0].alias("approx_p50"),
        F.col("approx_p50_p99")[1].alias("approx_p99"),
        "cnt",
    )

"""Third tranche of TPC-H-shaped queries — completes the sweep of
plan shapes the benchmark suite exercises (SURVEY §2.6 extension
surface): correlated min-per-group (Q2), EXISTS semi-join (Q4),
market-share conditional ratio (Q8), profit rollup (Q9), global-
fraction HAVING (Q11), dual conditional counts (Q12), max-over-
aggregate view join (Q15), grouped distinct-count with exclusion
anti-join (Q16), disjunctive multi-range predicates (Q19), nested
semi-join chain (Q20), and the exists/not-exists "only failer"
correlation (Q21).

The driver test tables have no partsupp table and no
shipmode/commitdate/receiptdate columns, so each query keeps the
TPC-H plan SHAPE (what Catalyst has to get right) while sourcing the
part-supplier relation from lineitem and the status predicates from
returnflag/linestatus/orderpriority.

Exactness: money through DECIMAL, raw-double comparisons only on
unaggregated values (MIN/MAX of stored 2-decimal doubles are exact),
ratios computed as one division of two exactly-summed doubles with an
identical expression tree in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import register
from .tables import load

_PRICE = "cast(l_extendedprice as decimal(14,2))"
_DISC1 = "(cast(1.00 as decimal(3,2)) - cast(l_discount as decimal(4,2)))"


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cand AS (
        SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal,
               MIN(l_extendedprice) AS cost
        FROM lineitem, part, supplier, nation, region
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10
        GROUP BY p_partkey, p_brand, s_suppkey, s_name, s_acctbal
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, cost
    FROM cand
    WHERE cost = (SELECT MIN(cost) FROM cand c2
                  WHERE c2.p_partkey = cand.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier (correlated
    scalar subquery). The correlation is planned as a window MIN over
    the per-(part, supplier) aggregate. The explicit
    repartition(p_partkey) BEFORE the groupBy makes ONE exchange serve
    both operators: partitioning on a subset of the group keys
    satisfies the aggregation's clustered distribution (partial
    combine still runs below the exchange), and the window's
    partitionBy(p_partkey) is then already satisfied — where the
    default plan shuffles twice (once on all five group keys, again
    on p_partkey).
    Cost is MIN of a stored 2-decimal double: no arithmetic, so the
    cross-engine comparison is exact."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp_eu = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    cand = (
        # part/supplier scale with SF — no broadcast hints; AQE
        # promotes the filtered sides when genuinely small
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp_eu, li.l_suppkey == supp_eu.s_suppkey)
        .repartition(F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("cost").over(w))
        .where(F.col("cost") == F.col("min_cost"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "cost")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join.
    The semi join keeps only the orderkey column of the probe side and
    never duplicates orders rows (EXISTS semantics for multi-match
    lineitems come free with the join type)."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN {_PRICE} * {_DISC1} END) AS DOUBLE)
             / CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS mkt_share
    FROM lineitem, orders, customer, supplier, part,
         nation n1, nation n2, region
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey AND l_partkey = p_partkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND s_nationkey = n2.n_nationkey
      AND r_name = 'AMERICA' AND p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional aggregate
    ratio over a two-role dimension (nation joined twice: customer's
    market nation and supplier's nation). Only nation/region (fixed 25
    and 5 rows) carry broadcast hints; part/supplier/customer scale
    with SF so those edges are AQE-decided (sort-merge at 100 TB).
    The share is ONE division of two decimal-exact sums, so the
    double is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust_am = (
        cust.join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    supp_n = supp.join(
        F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_am, orders.o_custkey == cust_am.c_custkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
    )
    vol = f"{_PRICE} * {_DISC1}"
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.expr(
                f"cast(sum(case when supp_nation = 'NATION_3' then {vol} end) as double)"
                f" / cast(sum({vol}) as double)"
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS profit
    FROM lineitem, orders, supplier, part, nation
    WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND l_partkey = p_partkey AND s_nationkey = n_nationkey
      AND p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-filtered fact scan. (No partsupp table, so profit omits the
    supplycost term; the plan shape — fact scan joined to one fixed
    dim (nation, hint-broadcast) and two SF-scaled dims
    (part/supplier, AQE-decided), two-column rollup — is what's under
    test.)"""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    nation = load(spark, sf_dir, "nation")
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(SUM({_PRICE}) AS DOUBLE) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value FROM per_part
    WHERE part_value > (SELECT CAST(SUM({_PRICE}) AS DOUBLE) * 0.0006
                        FROM lineitem)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups filtered against a GLOBAL scalar
    aggregate (HAVING value > fraction * total). The scalar subquery
    is a broadcast of one row; the threshold double is the same
    sum-through-decimal seen by the per-part branch so the comparison
    is consistent. One scan feeds both branches at sf-test sizes;
    at 100 TB the two aggregations share the shuffled intermediate via
    Spark's ReusedExchange when AQE notices the common subplan."""
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.expr(f"cast(sum({_PRICE}) as double)").alias("part_value")
    )
    total = li.agg(
        (F.expr(f"cast(sum({_PRICE}) as double)") * F.lit(0.0006)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem, orders
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + dual conditional counts (CASE inside
    SUM). The orders side carries only (orderkey, priority) into the
    broadcast; the date filter pushes into the lineitem scan."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar MAX + equality join
    back. The MAX is an unpartitioned window over the per-supplier
    aggregate (100 suppliers — tiny; at real scale Spark plans this as
    a single-partition window over the already-aggregated relation,
    NOT a re-scan of the fact table, which is the point of the view).
    Exact: revenue sums through decimal; the MAX compares those exact
    doubles."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("total_revenue")
    )
    w = Window.partitionBy()
    top = revenue.withColumn("max_rev", F.max("total_revenue").over(w)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    # supplier scales with SF — no hint; `top` is ~1 row so AQE
    # broadcasts THAT side at runtime
    return top.join(
        supp, top.supplier_no == supp.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue")


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND p_type <> 'STANDARD' AND p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: grouped distinct-count with a NOT IN exclusion
    subquery (NOT IN == anti join — the subquery is provably
    non-null). part and the supplier subset both scale with SF, so
    neither join carries a broadcast hint; the distinct count shuffles
    (brand, size, suppkey) once."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_type") != "STANDARD") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS revenue,
           COUNT(*) AS cnt
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
            AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd multi-column range branches across
    both join sides. Catalyst extracts the common per-side conjuncts
    (p_size lower bound, brand IN set) and pushes them below the join,
    leaving the full disjunction as the post-join filter."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & q.between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & q.between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & q.between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(b1 | b2 | b3)
        .agg(
            F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q20_heavy_shippers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_type = 'PROMO')
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 500
      )
    """,
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries -> a semi-join chain
    (part filter semi-joins into lineitem, the HAVING aggregate
    semi-joins into supplier). part and the `heavy` per-suppkey
    aggregate both scale with SF — no hints on those edges; only the
    fixed nation dim is hint-broadcast. l_quantity is integral-valued
    so the HAVING sum is exact."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 500)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


@register(
    "q21_sole_failing_supplier",
    oracle="""
    WITH order_stats AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                   THEN l_suppkey END) AS n_fail
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l, orders o, order_stats st
        WHERE l.l_orderkey = o.o_orderkey AND l.l_orderkey = st.l_orderkey
          AND o.o_orderstatus = 'F' AND l.l_returnflag = 'R'
          AND st.n_supps > 1 AND st.n_fail = 1
    ) fails, supplier
    WHERE fails.l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def q21_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the exists/not-exists double correlation
    ("supplier who kept the order waiting while every OTHER supplier
    delivered"), planned without self-joining the fact twice: ONE
    aggregation computes per-order supplier counts and failing-supplier
    counts, and the exists (>1 supplier) / not-exists (no OTHER failer)
    conditions become predicates on that aggregate — two shuffles of
    the fact total, vs. three fact-sized semi/anti joins in the naive
    translation.

    Physical detail: BOTH distinct counts and the failing-pair set
    derive from one level-1 groupBy(orderkey, suppkey) aggregate
    (failed = any R row). A direct double countDistinct would make
    Catalyst Expand every input row x3 (one replica per distinct
    aggregate); deriving counts from level-1 keeps one scan, and the
    two consumers share the level-1 Exchange (AQE stage reuse)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load(spark, sf_dir, "supplier")
    # one exchange on l_orderkey clusters BOTH aggregation levels
    # (subset-of-group-keys distribution; map-side combine intact) and
    # co-partitions the stats/fails consumers — measured 2.1s -> 1.0s
    level1 = li.repartition(F.col("l_orderkey")).groupBy(
        "l_orderkey", "l_suppkey"
    ).agg(F.max(F.col("l_returnflag") == "R").alias("failed"))
    stats = level1.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.count_if("failed").alias("n_fail"),
    )
    sole = stats.where((F.col("n_supps") > 1) & (F.col("n_fail") == 1)).select(
        "l_orderkey"
    )
    fails = (
        level1.where("failed")
        .join(orders, level1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(sole, "l_orderkey", "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    return (
        # supplier scales with SF — AQE decides broadcast vs sort-merge
        fails.join(supp, fails.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "asof_click_attribution",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 1 AS side,
               NULL::BIGINT AS r_event_id, NULL::TIMESTAMP AS r_ts
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS side, event_id, ts
        FROM events WHERE event_type = 'view'
    ),
    carried AS (
        SELECT user_id, ts, event_id, side,
               last_value(r_event_id IGNORE NULLS) OVER w AS asof_view_id,
               last_value(r_ts IGNORE NULLS) OVER w AS asof_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), side, event_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id, event_id AS click_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           asof_view_id,
           strftime(asof_ts, '%Y-%m-%d %H:%M:%S') AS view_ts
    FROM carried WHERE side = 1
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (temporal attribution): each click matched to the
    user's latest view at-or-before the click. ONE shuffle of
    |clicks|+|views| rows via the union + ignore-nulls-last-value
    carry-forward — never the |L| x |R-prefix| explosion of an
    inequality join. The oracle replays the SAME window formulation
    (DuckDB's native ASOF JOIN has its own tie rules; the shared
    formulation pins semantics exactly: right-at-equal-ts matches,
    ties broken by event_id)."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        clicks,
        views,
        by=["user_id"],
        ts_col="ts",
        value_cols=["event_id"],
        tie_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_event_id").alias("asof_view_id"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


@register(
    "interval_click_errors",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_errors_near
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'click') c
    JOIN (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND abs(epoch_us(c.ts) // 1000000 - epoch_us(e.ts) // 1000000) <= 300
    GROUP BY c.user_id, c.event_id
    """,
)
def interval_click_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: errors within +-5 minutes of each click,
    same user. Time-bucketized equi-join (bin = ts div tolerance, left
    exploded to neighbor bins) — hash-joinable, O(|L|*3 + |R|) shuffle,
    never the per-key cartesian a raw |dt|<=300 theta-join plans. The
    oracle uses the naive inequality join (fine at sf0.01; the
    OPERATOR is the scale path). Clicks with no nearby error are
    absent from both (inner semantics)."""
    from ..operators.asof import interval_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    pairs = interval_join(
        clicks,
        errors,
        by=["user_id"],
        ts_col="ts",
        tolerance_seconds=300,
        right_cols=["event_id"],
    )
    return pairs.groupBy("user_id", F.col("event_id").alias("click_id")).agg(
        F.count(F.lit(1)).alias("n_errors_near")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey,
               CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey
         AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. The ON-
    clause predicate (order filter inside the OUTER join, so non-
    matching customers still count as 0) and the count-of-counts
    double aggregation are the shapes under test; the driver tables
    have no o_comment, so the NOT-LIKE filter becomes a priority
    filter. COUNT(o_orderkey) counts only matched rows — NULLs from
    the outer join are skipped, exactly the TPC-H semantics. First
    aggregation clusters on c_custkey (the join key), so AQE plans it
    from the join's exchange without a second shuffle; the second
    aggregation's input is one row per customer, tiny."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2)))
                AS DECIMAL(24,2)) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2)))
                                   AS DOUBLE) / COUNT(*)
                       FROM customer
                       WHERE c_acctbal > 0.00
                         AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy dormant customers by country. Three
    shapes: an uncorrelated scalar subquery (global AVG) broadcast as
    a literal-like threshold via a cross join of a 1-row aggregate, a
    NOT EXISTS anti-join against orders, and a final rollup. The
    driver tables have no c_phone, so country code is c_nationkey
    directly (same IN-list + grouping semantics). The 1-row avg side
    is a broadcast-nested-loop join (free); the anti join is the only
    shuffle of customer. The threshold is exact-decimal SUM divided by
    COUNT — one IEEE double division over identical inputs in both
    engines — because a plain double AVG is summation-order-dependent
    and could flip a borderline customer; the REPORTED money total
    goes through decimal."""
    codes = [1, 3, 5, 7, 9, 11, 13]
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(codes)
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)"))
            .cast("decimal(24,2)")
            .alias("totacctbal"),
        )
    )

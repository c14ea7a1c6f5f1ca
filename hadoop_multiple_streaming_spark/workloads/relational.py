"""Relational headline queries (TPC-H-style) — the native DataFrame
surface the reference's users get for free when switching to Spark
(SURVEY §2.6: joins/windows/set-ops are extension surface, expressed
declaratively so Catalyst plans them: broadcast joins for dims,
partial aggregation, predicate pushdown into the parquet scans).

Exactness: money math goes through DECIMAL (exact, then one cast to
double at the end); dates serialize to strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from .tables import load

# decimal helpers — tight precisions so both engines stay exact without
# hitting the 38-digit cap (Spark and DuckDB both cap at 38)
_PRICE = "cast(l_extendedprice as decimal(14,2))"
_DISC1 = "(cast(1.00 as decimal(3,2)) - cast(l_discount as decimal(4,2)))"
_TAX1 = "(cast(1.00 as decimal(3,2)) + cast(l_tax as decimal(4,2)))"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE)                          AS sum_qty,
           CAST(SUM({_PRICE}) AS DOUBLE)                            AS sum_base_price,
           CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE)                 AS sum_disc_price,
           CAST(SUM({_PRICE} * {_DISC1} * {_TAX1}) AS DOUBLE)       AS sum_charge,
           CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)               AS avg_qty,
           CAST(SUM({_PRICE}) AS DOUBLE) / COUNT(*)                 AS avg_price,
           CAST(SUM(cast(l_discount as decimal(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate. Filter + 7-column
    projection push into the parquet scan; Catalyst does
    partial+final hash aggregation (map-side combine, reference G4)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.expr(f"cast(sum({_PRICE}) as double)").alias("sum_base_price"),
            F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("sum_disc_price"),
            F.expr(f"cast(sum({_PRICE} * {_DISC1} * {_TAX1}) as double)").alias("sum_charge"),
            F.expr("cast(sum(l_quantity) as double) / count(*)").alias("avg_qty"),
            F.expr(f"cast(sum({_PRICE}) as double) / count(*)").alias("avg_price"),
            F.expr(
                "cast(sum(cast(l_discount as decimal(4,2))) as double) / count(*)"
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')        AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    orders and customer both scale with the fact data, so neither is
    hinted broadcast — the li⋈orders edge is a sort-merge join on
    l_orderkey at scale (AQE still converts small sides at runtime);
    ties broken by l_orderkey so the LIMIT is deterministic."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    joined = li.join(
        orders.join(cust, orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join. Only the fixed-size dims
    (region=5, nation=25) are hint-broadcast; supplier, orders and
    customer all scale with SF so their edges stay shuffle joins
    (sort-merge at scale; AQE converts them to broadcast at runtime
    when the filtered side is actually small)."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dims = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    joined = (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            customer,
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == dims.s_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        F.expr(f"cast(sum({_PRICE} * {_DISC1}) as double)").alias("revenue")
    )


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(cast(value as decimal(14,2))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup over the events stream table — the batch
    twin of the Structured Streaming windowed agg (streaming/fanout).
    One shuffle; count-distinct planned as partial aggregation."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr("cast(sum(cast(value as decimal(14,2))) as double)").alias("sum_value"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
    )


@register(
    "first_event_per_user",
    oracle="""
    SELECT user_id, event_type AS first_event,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
)
def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface (reference G5's secondary-sort use case
    expressed natively): per-key ordered pick with deterministic
    event_id tie-break."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_event"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({_PRICE} * cast(l_discount as decimal(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no grouping — the
    predicate-pushdown showcase (all four filters reach the parquet
    scan; doubles compare exactly because the data is 2-decimal)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                f"cast(sum({_PRICE} * cast(l_discount as decimal(4,2))) as double)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "customer_order_counts",
    oracle="""
    SELECT order_cnt, COUNT(*) AS n_customers FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) t GROUP BY order_cnt
    """,
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join + double aggregation (customers by
    how many orders they placed, zeros included via the left join)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return per_cust.groupBy("order_cnt").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "events_sessionize",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) // 1000000
                         - lag(epoch_us(ts) // 1000000) OVER w <= 1800
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id
                                           ORDER BY epoch_us(ts), event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
        FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap): lag +
    cumulative-sum windows, both riding ONE hash partitioning on
    user_id (no extra shuffle between the two window functions)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") <= 1800,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    sessions = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@register(
    "secondary_sort_events",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id)
               AS ordered_events
    FROM events GROUP BY user_id
    """,
)
def secondary_sort_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary-sort surface (reference G5: KeyFieldBasedComparator):
    per key, the value stream in a caller-chosen order — here as an
    ordered aggregation (sort_array over structs, one shuffle)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type))), "
            "x -> x.event_type), ',')"
        ).alias("ordered_events")
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           COUNT(json_extract_string(props, '$.k')) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract fields from a JSON string
    column (get_json_object stays JVM-side; no Python parsing)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.get_json_object("props", "$.k")).alias("n_with_k"),
    )


@register(
    "set_ops_customers",
    oracle="""
    WITH early AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
         late AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    SELECT 'both' AS cohort, COUNT(*) AS n FROM (
        SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late) t
    UNION ALL
    SELECT 'early_only' AS cohort, COUNT(*) AS n FROM (
        SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late) t
    UNION ALL
    SELECT 'late_only' AS cohort, COUNT(*) AS n FROM (
        SELECT o_custkey FROM late EXCEPT SELECT o_custkey FROM early) t
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operations (INTERSECT / EXCEPT): customer cohorts
    by order-date era. The reference has no set ops at all (§2.6);
    Spark plans them as hash semi/anti joins."""
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    early = orders.where(F.col("o_orderdate") < cutoff).select("o_custkey").distinct()
    late = orders.where(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()
    both = early.intersect(late).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    early_only = early.exceptAll(late).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("early_only").alias("cohort"), "n"
    )
    late_only = late.exceptAll(early).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("late_only").alias("cohort"), "n"
    )
    return both.unionByName(early_only).unionByName(late_only)


@register(
    "lineitem_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregates (ROLLUP): per (flag, status), per flag,
    and grand total in one pass — Catalyst plans it as a single Expand
    + hash aggregation (SURVEY §2.5: free once DataFrame-based)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
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
    "part_supplier_topn",
    oracle="""
    SELECT p_brand, s_name, cnt, total_qty FROM (
        SELECT p_brand, s_name,
               COUNT(*) AS cnt,
               CAST(SUM(l_quantity) AS DOUBLE) AS total_qty,
               row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY CAST(SUM(l_quantity) AS DOUBLE) DESC, s_name
               ) AS rn
        FROM lineitem, part, supplier
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        GROUP BY p_brand, s_name
    ) t WHERE rn <= 3
    """,
)
def part_supplier_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + grouped top-N per key (window over aggregate): the
    'top suppliers per brand' pattern. part (SF x 200k) and supplier
    (SF x 10k) scale with the data, so no broadcast hints — AQE
    promotes them at runtime when small; at 100 TB these are
    sort-merge edges. One shuffle for the agg, window rides the same
    partitioning."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        # one exchange on the window's partition key serves the
        # aggregation too (subset-of-group-keys clustering; partial
        # combine still runs below it) — see q2_min_cost_supplier
        .repartition(F.col("p_brand"))
        .groupBy("p_brand", "s_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").cast("double").alias("total_qty"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("total_qty"), F.asc("s_name"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "s_name", "cnt", "total_qty")
    )

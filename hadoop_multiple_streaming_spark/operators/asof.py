"""As-of (temporal) join — for each left row, the LATEST right row
with right.ts <= left.ts on the same key. Spark has no built-in as-of
join; the naive formulations both fail at scale:

  * inequality join + groupBy(max) explodes to |L| x |R-prefix| rows;
  * per-key collect + Python search leaves the JVM.

This implementation is the union + carry-forward trick: tag both
sides, union them, and run ONE ordered window per key where each left
row picks up the last non-null right value seen so far
(``last(col, ignorenulls=True)`` over rows-unbounded-preceding). Cost
is a single hash shuffle of |L|+|R| rows and one in-partition sort —
the same price as a groupBy over the union, independent of time-range
width. Ordering within a timestamp tie is right-rows-first (so a
right row AT the left row's exact ts matches, i.e. <= semantics),
then by the caller's tie column for determinism.

At 100 TB: the shuffle key is the join key — salt hot keys first if
one entity dominates (see shuffle.salted_aggregate's discussion); a
``tolerance`` bound also caps how stale a match may be, which lets a
downstream filter drop ancient carry-forwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    value_cols: list[str],
    tie_col: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left rows + ``value_cols`` (renamed ``asof_<col>``) from the
    latest right row with right.ts <= left.ts on the same ``by`` key;
    ``asof_ts`` carries the matched right timestamp (null = no match).

    ``tie_col`` orders rows WITHIN one (key, ts, side) — pass a unique
    id so results are deterministic when a key has several right rows
    at the same timestamp (the largest tie_col wins, matching "latest
    row" semantics).

    ``tolerance_seconds`` drops matches older than the bound (the
    match columns become null, the left row survives).
    """
    tie = [tie_col] if tie_col else []
    lt = left.select(
        *by,
        ts_col,
        *tie,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[c for c in left.columns if c not in {*by, ts_col, *tie}],
    )
    rt = right.select(
        *by,
        ts_col,
        *tie,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in {*by, ts_col, *tie}
        ],
    )
    rt = rt.withColumn("_r_ts", F.col(ts_col))
    lt = lt.withColumn("_r_ts", F.lit(None).cast(left.schema[ts_col].dataType))
    u = lt.unionByName(rt)
    # right rows sort BEFORE left rows at the same ts -> <= semantics
    order = [F.col(ts_col).asc(), F.col("_side").asc()] + [F.col(c).asc() for c in tie]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        stale = (
            F.col(ts_col).cast("long") - F.col("asof_ts").cast("long")
            > tolerance_seconds
        )
        out = out.select(
            *[c for c in out.columns if not c.startswith("asof_")],
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
            F.when(stale, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
        )
    return out.drop("_side", "_r_ts", *[f"_r_{c}" for c in value_cols])


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    tolerance_seconds: int,
    right_cols: list[str],
) -> DataFrame:
    """Range join: all (left, right) pairs on the same key with
    |left.ts - right.ts| <= tolerance. A naive theta-join on the
    inequality is planned as BroadcastNestedLoop / cartesian-per-key;
    this implementation BUCKETIZES time into tolerance-width bins and
    equi-joins on (key, bin), with the left side exploded to its bin
    and both neighbors (any in-range pair differs by at most one bin).
    The equi-join hash-partitions like any other join — O(|L|*3 + |R|)
    shuffled rows plus true-pair output, never per-key cartesian. The
    exact |dt| <= tolerance filter runs post-join (bins overcount by
    at most the neighbor bins).

    right_cols are emitted as ``r_<col>``; ``r_ts`` carries the right
    timestamp; left columns pass through. Pairs are emitted exactly
    once: each right row lives in ONE bin and each left row lists each
    neighbor bin once, so no post-join distinct is needed.
    """
    bin_l = F.expr(f"cast({ts_col} as long) div {tolerance_seconds}")
    lt = left.withColumn("_bin", F.explode(F.array(bin_l - 1, bin_l, bin_l + 1)))
    rt = right.select(
        *[F.col(c).alias(f"_rk_{c}") for c in by],
        F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    ).withColumn("_rbin", F.expr(f"cast(r_ts as long) div {tolerance_seconds}"))
    cond = lt["_bin"] == rt["_rbin"]
    for c in by:
        cond = cond & (lt[c] == rt[f"_rk_{c}"])
    in_range = (
        F.abs(F.col(ts_col).cast("long") - F.col("r_ts").cast("long"))
        <= tolerance_seconds
    )
    return (
        lt.join(rt, on=cond)
        .where(in_range)
        .drop("_bin", "_rbin", *[f"_rk_{c}" for c in by])
    )

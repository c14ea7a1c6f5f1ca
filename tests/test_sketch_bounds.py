"""Quantitative error bounds for the sketch surface (VERDICT r10 item
5): events_approx_profile is rows-only in the driver window because
HLL++/KLL outputs are engine-implementation-defined — but their ERROR
vs the exact twin is specified, so assert it:

* approx_count_distinct(rsd=0.05 default): relative error vs exact
  COUNT(DISTINCT) within 3*rsd (three standard errors — HLL++'s rsd is
  the standard deviation of its relative error).
* percentile_approx(accuracy=10000): rank error <= 1/accuracy. The
  returned value v is an actual data point; the Greenwald-Khanna-style
  guarantee is (q-eps)*n <= rank(v) <= (q+eps)*n. Checked via two
  one-sided counts (<= v and < v), never collecting the group.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark import workloads

workloads.load_all()

SFS = [d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf", SFS)
def test_approx_profile_error_bounds(spark, sf):
    approx = {
        r["event_type"]: r
        for r in workloads.QUERIES["events_approx_profile"](spark, sf).collect()
    }
    exact = {
        r["event_type"]: r
        for r in workloads.QUERIES["events_exact_profile"](spark, sf).collect()
    }
    assert set(approx) == set(exact)

    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    # ONE aggregation job for all groups' rank checks: per group, count
    # of values <= / < that group's approx quantile. The quantile per
    # group enters the plan as a CASE over event_type literals (group
    # count is tiny — 5 event types), so no collect of any group.
    rsd = 0.05  # approx_count_distinct default
    eps = 1.0 / 10000  # percentile_approx accuracy=10000
    ets = sorted(approx)
    q50 = F.coalesce(
        *[
            F.when(F.col("event_type") == et, F.lit(approx[et]["approx_p50"]))
            for et in ets
        ]
    )
    q99 = F.coalesce(
        *[
            F.when(F.col("event_type") == et, F.lit(approx[et]["approx_p99"]))
            for et in ets
        ]
    )
    rank_rows = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") <= q50).cast("long")).alias("le_p50"),
            F.sum((F.col("value") < q50).cast("long")).alias("lt_p50"),
            F.sum((F.col("value") <= q99).cast("long")).alias("le_p99"),
            F.sum((F.col("value") < q99).cast("long")).alias("lt_p99"),
        )
        .collect()
    )
    by_et = {r["event_type"]: r for r in rank_rows}
    for et in ets:
        a, e = approx[et], exact[et]
        # exact count carried in both queries must agree exactly
        assert a["cnt"] == e["cnt"]
        # HLL++: |approx - exact| / exact <= 3 * rsd
        rel = abs(a["approx_users"] - e["n_users"]) / e["n_users"]
        assert rel <= 3 * rsd, (et, a["approx_users"], e["n_users"], rel)
        # KLL rank bound per quantile: rank interval of the returned
        # value is [lt+1, le]; it must intersect [(q-eps)n, (q+eps)n]
        # (+-1 rank discreteness slack)
        r = by_et[et]
        n = r["n"]
        for q_name, q in (("p50", 0.5), ("p99", 0.99)):
            lo = (q - eps) * n - 1
            hi = (q + eps) * n + 1
            le, lt = r[f"le_{q_name}"], r[f"lt_{q_name}"]
            assert lt <= hi and le >= lo, (et, q_name, lt, le, lo, hi, n)

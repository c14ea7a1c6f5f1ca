"""Tests for the skew-handling salted aggregation (operators.shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.operators.shuffle import salted_aggregate


def test_salted_aggregate_matches_plain(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", i % 7) for i in range(900)] + [
        (f"k{i % 13}", i % 5) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "key string, v int")
    salted = salted_aggregate(
        df,
        ["key"],
        [
            F.sum("v").alias("sum_v"),
            F.count(F.lit(1)).alias("cnt"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        ],
        salt_buckets=8,
    )
    plain = df.groupBy("key").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).alias("cnt"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    got = {r.key: (r.sum_v, r.cnt, r.min_v, r.max_v) for r in salted.collect()}
    want = {r.key: (r.sum_v, r.cnt, r.min_v, r.max_v) for r in plain.collect()}
    assert got == want


def test_salted_join_matches_plain(spark):
    from hadoop_multiple_streaming_spark.operators.shuffle import salted_join

    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(i % 20 + 2, i) for i in range(100)],
        "k long, v long",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 15)], "k long, name string"
    )
    got = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(fact, dim, "k", salt_buckets=8).collect()
    )
    want = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    assert got == want
    # left join: unmatched fact keys survive exactly once
    gotl = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(fact, dim, "k", salt_buckets=8, how="left").collect()
    )
    wantl = sorted(
        (r.k, r.v, r.name) for r in fact.join(dim, "k", "left").collect()
    )
    assert gotl == wantl
    assert len(gotl) > len(got)  # some keys (15..21) are dim-missing


def test_salted_join_rejects_outer_dim(spark):
    import pytest

    from hadoop_multiple_streaming_spark.operators.shuffle import salted_join

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(df, df, "k", how=how)


def test_salted_join_partitions_on_salt(spark):
    """The whole point: the join's shuffle must partition on
    (key, _salt), not the key alone — assert it structurally in the
    plan under no-broadcast so AQE can't hide the exchanges."""
    import contextlib
    import io as _io

    from hadoop_multiple_streaming_spark.operators.shuffle import salted_join

    fact = spark.createDataFrame([(1, i) for i in range(50)], "k long, v long")
    dim = spark.createDataFrame([(1, "d")], "k long, name string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(fact, dim, "k", salt_buckets=4)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    salted_exchanges = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning" in ln and "_salt" in ln
    ]
    assert len(salted_exchanges) >= 2, plan  # both sides shuffle on the salt

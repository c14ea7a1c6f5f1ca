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

"""Tests for deterministic sampling/splitting (functions.sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.functions.sampling import (
    SPACE,
    assign_split,
    deterministic_sample,
    hash_value,
    stratified_sample,
)


def ids_df(spark, n=500):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_hash_value_range_and_stability(spark):
    df = ids_df(spark)
    vals = [r.v for r in df.select(hash_value("doc_id").alias("v")).collect()]
    assert all(0 <= v < SPACE for v in vals)
    vals2 = [r.v for r in df.select(hash_value("doc_id").alias("v")).collect()]
    assert vals == vals2  # no RNG anywhere


def test_assign_split_proportions_and_stability(spark):
    df = ids_df(spark, 2000)
    out = df.select("doc_id", assign_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("s"))
    counts = {r.s: r.c for r in out.groupBy("s").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    # growing the dataset never reassigns existing rows
    small = {r.doc_id: r.s for r in out.where(F.col("doc_id") < 500).collect()}
    again = {
        r.doc_id: r.s
        for r in ids_df(spark, 500)
        .select("doc_id", assign_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("s"))
        .collect()
    }
    assert small == again


def test_deterministic_sample_subset_property(spark):
    df = ids_df(spark, 1000)
    s10 = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    s30 = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.3).collect()}
    assert s10 <= s30  # threshold sampling nests: smaller ⊂ larger
    assert 0.05 <= len(s10) / 1000 <= 0.16


def test_stratified_sample(spark):
    df = ids_df(spark, 1000).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr")
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.2})
    counts = {r.lang: r.c for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts["fr"] == 500  # untouched stratum kept whole
    assert 50 <= counts["en"] <= 150  # ~20% of 500


def test_quota_sample(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import quota_sample

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = quota_sample(df, "doc_id", "lang", quota=5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 5 and len(by_lang["zh"]) == 5
    # determinism: same kept set on re-run and under different partitioning
    out2 = quota_sample(df.repartition(7), "doc_id", "lang", quota=5).collect()
    by_lang2 = {}
    for r in out2:
        by_lang2.setdefault(r.lang, set()).add(r.doc_id)
    assert by_lang == by_lang2
    # quota larger than the group keeps everything
    assert quota_sample(df, "doc_id", "lang", quota=100).count() == 40
    with pytest.raises(ValueError, match="quota"):
        quota_sample(df, "doc_id", "lang", quota=0)

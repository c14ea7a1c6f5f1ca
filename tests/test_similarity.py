"""Unit tests for similarity search (operators.similarity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.operators.dedup import quantize_embeddings
from hadoop_multiple_streaming_spark.operators.similarity import cosine_topk, ivf_topk


def corpus(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.1, 0.9], 1),
        (4, [0.7, 0.7], 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return quantize_embeddings(df, "embedding", "vec_id", keep_cols=["label"])


def test_cosine_topk_ordering(spark):
    q = corpus(spark)
    got = cosine_topk(q, q.where(F.col("id") == 0), k=2).collect()
    ranked = [(r.rank, r.neighbor_id) for r in sorted(got, key=lambda r: r.rank)]
    # closest to (1,0): vec 1 (0.9,0.1), then vec 4 (0.7,0.7)
    assert ranked == [(1, 1), (2, 4)]
    assert all(r.query_id == 0 for r in got)


def test_cosine_topk_excludes_self(spark):
    q = corpus(spark)
    got = cosine_topk(q, q.where(F.col("id") == 0), k=10).collect()
    assert all(r.neighbor_id != 0 for r in got)
    assert len(got) == 4


def test_ivf_restricts_to_bucket(spark):
    q = corpus(spark)
    got = ivf_topk(q, q.where(F.col("id") == 0), bucket_col="label", k=10).collect()
    # label 0 bucket: vecs 1 and 4 only
    assert {r.neighbor_id for r in got} == {1, 4}

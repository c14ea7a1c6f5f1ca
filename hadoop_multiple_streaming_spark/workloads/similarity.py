"""Similarity-search workload queries: brute-force cosine top-k and
IVF-bucketed ANN over the embeddings table, oracle-verified via the
same quantized-integer cosine math."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import quantize_embeddings
from ..operators.similarity import cosine_topk, ivf_topk
from . import register
from .dedup import _QUANT_CTE
from .tables import load


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH {_QUANT_CTE},
    scored AS (
        SELECT qq.id AS query_id, c.id AS neighbor_id,
               list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)) AS cosine
        FROM n qq JOIN n c ON qq.id < 10 AND c.id <> qq.id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM scored
    ) t WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-5 cosine neighbors for 10 query vectors:
    broadcast the small query side, stream the corpus, window top-k.
    The baseline every ANN variant is measured against."""
    emb = load(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding", "vec_id")
    out = cosine_topk(q, q.where(F.col("id") < 10), k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_QUANT_CTE},
    scored AS (
        SELECT qq.id AS query_id, c.id AS neighbor_id,
               list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)) AS cosine
        FROM n qq JOIN n c ON qq.id < 10 AND c.label = qq.label AND c.id <> qq.id
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank
        FROM scored
    ) t WHERE rank <= 3
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned top-3 (nprobe=1): candidates restricted to the
    query's coarse bucket — here the `label` column plays the
    centroid-assignment role a KMeans quantizer fills in production.
    At scale the corpus is partitioned by bucket, so a probe is a
    partition-pruned scan instead of a full pass."""
    emb = load(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding", "vec_id", keep_cols=["label"])
    out = ivf_topk(q, q.where(F.col("id") < 10), bucket_col="label", k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))

"""Engine-internal recall gate for IVF-PQ at oracle-DNF scale.

The DuckDB oracle for ann_ivfpq_adc dies from sf1.0 up (CROSSOVER.md:
the corpus x codebook dists CTE blows past 70 GB RSS), so the at-scale
rows were timing-only. This gate is Spark-vs-Spark: recall@3 of the
IVFADC result against the engine's own exact cosine top-k on the
sf1.0-distribution embeddings (20k vectors, generated deterministically
by the same tools/gen_scaled_docs recipe, seed 4242) — no external
oracle needed, mirroring ann_pq_train_recall.

Measured recall@3 = 18/30 = 0.60 with the r13 trained pipeline
(integer-Lloyd coarse cells from data-point init, residual-trained PQ,
nprobe=4, exact top-100 refine). The r12 exemplar form measured 0.10 —
and the instrumented decomposition showed WHY: with data-point-seeded
k-means the coarse ceiling is 30/30 (every true neighbor in a probed
cell, cells balanced 1170-1330), so the entire loss was ADC ranking on
isotropic vectors, which no codebook size fixed (0.067 at k=16 probes
4 AND 6; 0.100 at 32 cells) — distances concentrate, near-ties are
sub-quantization-error. The refine stage is the fix real deployments
use (FAISS IndexRefineFlat): exact bigint L2 over the ADC shortlist.
The floor pins half the k*queries budget so a regression in candidate
generation, training, encoding, ADC, or refine fails loudly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

RECALL_FLOOR = 15 / 30  # measured 18/30; the verdict's >= 0.5 bar
_K = 3
_N_QUERIES = 10


@pytest.fixture(scope="module")
def sf1_dir(tmp_path_factory):
    """sf1.0 embeddings (20k x 64-dim unit vectors, ~1% near-dups):
    reuse .localdata/sf1.0 when present, else regenerate the identical
    table (fixed seed) into a tmp dir."""
    local = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1.0",
    )
    if os.path.exists(os.path.join(local, "embeddings.parquet")):
        return local
    import pyarrow.parquet as pq

    import tools.gen_scaled_docs as gen

    out = str(tmp_path_factory.mktemp("sf1emb"))
    pq.write_table(gen.gen_embeddings(1.0), os.path.join(out, "embeddings.parquet"))
    return out


def test_ivfpq_adc_recall_floor_at_sf1(spark, sf1_dir):
    from hadoop_multiple_streaming_spark import workloads
    from hadoop_multiple_streaming_spark.operators.dedup import (
        quantize_embeddings,
    )
    from hadoop_multiple_streaming_spark.operators.similarity import cosine_topk

    workloads.load_all()
    ivf = (
        workloads.QUERIES["ann_ivfpq_adc"](spark, sf1_dir)
        .select("query_id", "neighbor_id")
    )
    emb = spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet"))
    q = quantize_embeddings(emb, "embedding", "vec_id", keep_cols=["label"])
    exact = cosine_topk(q, q.where(F.col("id") < _N_QUERIES), k=_K).select(
        "query_id", "neighbor_id"
    )
    ivf_rows = ivf.collect()
    # shape: exactly k results per query, no duplicates
    per_q: dict[int, set[int]] = {}
    for r in ivf_rows:
        per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(per_q) == _N_QUERIES
    assert all(len(v) == _K for v in per_q.values()), per_q
    hits = exact.intersect(ivf).count()
    total = exact.count()
    assert total == _N_QUERIES * _K
    recall = hits / total
    assert recall >= RECALL_FLOOR, (
        f"IVFADC recall@{_K} collapsed: {hits}/{total} = {recall:.3f}"
        f" < floor {RECALL_FLOOR:.3f} — candidate generation, PQ"
        " encoding, or ADC ranking regressed"
    )

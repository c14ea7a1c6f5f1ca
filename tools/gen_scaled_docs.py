"""Generate LARGER documents tables for the dedup crossover benchmark.

The driver ships sf <= 0.1 only; the dedup floor analysis (DEPLOY.md
"stage floor, not plan") predicts Spark's wall-clock crosses under
2x DuckDB's once real work dominates the ~1.4 s scheduling constant,
which needs sf ~0.5-1.0. This script extends the driver's synthetic
documents distribution to those scales, deterministically (seed 42):

  * n_docs = 50_000 * sf (driver: 5_000 at sf0.1)
  * vocab  = the exact 31-token vocabulary observed in
    /root/testdata/sf0.1/documents.parquet (all 5 langs share it)
  * doc length ~ Uniform[10, 100] tokens (observed mean 54.1/std 25.7)
  * source  = f"src{doc_id % 20}" (exact observed rule)
  * lang    ~ {en: .41, zh/es/de/fr: ~.1475} (observed mix)
  * ~5% of docs duplicate a random earlier doc with 0-3 token edits
    (observed at sf0.1: 8 exact-dup pairs + 256 pairs at 3-gram
    jaccard >= 0.8 over 5000 docs)

Also generates embeddings.parquet at 20_000 * sf rows matching the
driver distribution (isotropic unit-norm 64-dim vectors — observed
per-dim std 0.123 ~ 1/sqrt(64), norm 1.0 — labels uniform over 0..9,
~1% near-duplicates: copy of an earlier vector + 5% gaussian noise,
renormalized; the driver data shows 13 cosine>=threshold pairs per
2000 vectors and zero exact copies).

Output dir gets documents.parquet + embeddings.parquet plus COPIES of
the other 8 driver tables from sf0.1 so every harness that registers
all views still works (only documents/embeddings are actually read by
the crossover queries).

    python tools/gen_scaled_docs.py 0.5 1.0   # -> .localdata/sf{X}/
"""

from __future__ import annotations

import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(REPO, ".localdata")

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events"
).split()


def gen_embeddings(sf: float, seed: int = 4242) -> "pa.Table":
    import numpy as np

    n = round(20_000 * sf)
    rng = np.random.default_rng(seed)
    vecs = np.empty((n, 64), dtype=np.float32)
    for i in range(n):
        if i > 0 and rng.random() < 0.01:
            base = vecs[rng.integers(0, i)]
            v = base + 0.05 * rng.standard_normal(64).astype(np.float32)
        else:
            v = rng.standard_normal(64).astype(np.float32)
        vecs[i] = v / np.linalg.norm(v)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 10, size=n).tolist(), pa.int32()
            ),
        }
    )


def zipf_vocab(size: int = 4000, exponent: float = 1.05):
    """A Zipfian vocabulary + cumulative weights: token i drawn with
    p(i) ∝ 1/(i+1)^exponent — the realistic word-frequency shape. The
    driver's 31-token uniform vocabulary saturates EVERY 3-gram at
    sf >= 4.0 (all shingles exceed any df cap; capped result empty by
    construction — round-11 verdict "What's missing" #2); a Zipfian
    vocab makes the ngram df-cap BIND selectively: head-token shingles
    blow past the cap (stop-phrase analogue), tail shingles survive,
    and near-dup pairs still share enough kept shingles to answer."""
    import itertools

    weights = [1.0 / (i + 1) ** exponent for i in range(size)]
    cum = list(itertools.accumulate(weights))
    vocab = [f"tok{i:04d}" for i in range(size)]
    return vocab, cum


def gen_documents(sf: float, seed: int = 42, zipf: bool = False) -> pa.Table:
    n = round(50_000 * sf)
    rng = random.Random(seed)
    if zipf:
        vocab, cum = zipf_vocab()

        def draw(k: int) -> list[str]:
            return rng.choices(vocab, cum_weights=cum, k=k)

        def one() -> str:
            return rng.choices(vocab, cum_weights=cum, k=1)[0]

    else:
        vocab = VOCAB

        def draw(k: int) -> list[str]:
            return [rng.choice(vocab) for _ in range(k)]

        def one() -> str:
            return rng.choice(vocab)

    texts: list[str] = []
    langs: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            # near-duplicate of an earlier doc: 0-3 token edits
            base = texts[rng.randrange(len(texts))].split(" ")
            for _ in range(rng.randint(0, 3)):
                base[rng.randrange(len(base))] = one()
            texts.append(" ".join(base))
        else:
            nw = rng.randint(10, 100)
            texts.append(" ".join(draw(nw)))
        langs.append(rng.choices(LANGS, weights=LANG_W)[0])
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def main() -> int:
    args = list(sys.argv[1:])
    zipf = "--zipf" in args
    if zipf:
        args.remove("--zipf")
    sfs = [float(a) for a in args] or [0.5, 1.0]
    for sf in sfs:
        out = os.path.join(OUT_ROOT, f"sf{sf}-zipf" if zipf else f"sf{sf}")
        os.makedirs(out, exist_ok=True)
        tbl = gen_documents(sf, zipf=zipf)
        pq.write_table(tbl, os.path.join(out, "documents.parquet"))
        emb = gen_embeddings(sf)
        pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
        for t in OTHER_TABLES:
            dst = os.path.join(out, f"{t}.parquet")
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(SRC_SF, f"{t}.parquet"), dst)
        print(f"sf{sf}: {tbl.num_rows} docs -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

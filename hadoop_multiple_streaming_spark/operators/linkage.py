"""Record linkage: blocked fuzzy (edit-distance) join.

Classic blocking-key record linkage (Fellegi–Sunter blocking; same
candidate-generation shape as the MinHash LSH dedup in
operators/dedup.py, with an equality block instead of banded hashes):
an equi-join on a cheap blocking key generates candidate pairs, a
guaranteed-sound length prefilter discards pairs that cannot be within
the distance budget, and the exact Levenshtein verify runs only on
what survives. Extension surface beyond the reference (the reference
has no joins at all — SURVEY.md §2.6); held to the same governor
discipline as the n-gram df-cap (operators/dedup.py max_doc_freq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    text_col: str,
    max_dist: int,
    max_block_rows: int | None = None,
) -> DataFrame:
    """All intra-block pairs (id_a < id_b) whose ``text_col`` values
    are within Levenshtein distance ``max_dist``. Returns
    (block_cols..., id_a, id_b, text_a, text_b, dist).

    Scale shape: pair generation is an equi-join ON THE BLOCK KEY —
    candidates are bounded by sum(block_size^2)/2, never corpus^2, and
    the join shuffles each side once on the block key. Two JVM-side
    filters run before anything expensive: id_a < id_b halves the
    candidates, and ``abs(len_a - len_b) <= max_dist`` is a sound
    prefilter (edit distance is lower-bounded by the length
    difference) that discards most of a diverse block at integer-
    compare cost before the O(len^2) Levenshtein DP. All of it is
    whole-stage-codegen'd builtins — no Python in the path.

    ``max_block_rows`` is the governor for skewed blocking keys (the
    analogue of ngram_jaccard_pairs' ``max_doc_freq``): blocks holding
    more rows than the cap are dropped ENTIRELY before pair expansion,
    bounding the worst block at cap^2/2 pairs. A block key that puts
    40% of a 100 TB corpus in one block is a mis-chosen key; the cap
    turns it into lost recall on that block instead of a dead executor.
    Pair counts vs the cap are exact (distinct-row count per block),
    so the oracle can replay the HAVING filter bit-for-bit.
    """
    if max_dist < 0:
        raise ValueError(f"blocked_fuzzy_pairs: max_dist must be >= 0, got {max_dist}")
    for reserved in ("_blk_n",):
        if reserved in df.columns:
            raise ValueError(
                f"blocked_fuzzy_pairs: input must not carry reserved column "
                f"{reserved!r}"
            )
    sides = df.select(*block_cols, id_col, text_col)
    if max_block_rows is not None:
        if max_block_rows < 1:
            raise ValueError(
                f"blocked_fuzzy_pairs: max_block_rows must be >= 1, "
                f"got {max_block_rows}"
            )
        counts = sides.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_blk_n"))
        keep = counts.where(F.col("_blk_n") <= max_block_rows).drop("_blk_n")
        # no broadcast hint: the kept-blocks relation is one row per
        # distinct block key — data-dependent, so let AQE pick the
        # strategy (it broadcasts when small; when block keys are
        # near-unique the semi join shares hashpartitioning(block key)
        # with the pair join below and the exchange is reused)
        sides = sides.join(keep, block_cols, "left_semi")
    a = sides.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
    )
    b = sides.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    return (
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.abs(F.length("text_a") - F.length("text_b")) <= F.lit(max_dist)
        )
        .where(F.levenshtein("text_a", "text_b") <= F.lit(max_dist))
        .select(
            *block_cols,
            "id_a",
            "id_b",
            "text_a",
            "text_b",
            F.levenshtein("text_a", "text_b").alias("dist"),
        )
    )

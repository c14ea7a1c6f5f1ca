"""Corpus-management operators (operators/corpus.py) and the blocked
fuzzy join (operators/linkage.py)."""

import pytest
from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.operators.corpus import (
    keep_best_representative,
    snapshot_diff,
)
from hadoop_multiple_streaming_spark.operators.linkage import blocked_fuzzy_pairs


def _docs(spark):
    return spark.createDataFrame(
        [
            # cluster A: ids 1,2,3 — 2 has the top score
            (1, "a", 10),
            (2, "a", 30),
            (3, "a", 20),
            # cluster B: tie on score — min id 4 must win
            (4, "b", 7),
            (5, "b", 7),
            # singleton
            (6, "c", 1),
        ],
        "id long, h string, score long",
    )


def test_keep_best_picks_max_score_min_id_tiebreak(spark):
    out = {
        r["h"]: (r["keep_id"], r["keep_score"], r["dup_cnt"])
        for r in keep_best_representative(_docs(spark), ["h"], "id", "score").collect()
    }
    assert out == {"a": (2, 30, 3), "b": (4, 7, 2), "c": (6, 1, 1)}


def test_keep_best_rejects_string_id(spark):
    df = spark.createDataFrame([("x", "a", 1)], "id string, h string, score long")
    with pytest.raises(ValueError, match="must be an integral type"):
        keep_best_representative(df, ["h"], "id", "score")


def test_keep_best_rejects_fractional_id_allows_float_score(spark):
    # fractional ids collapse under the cast-to-long tie-break (1.2 and
    # 1.7 both negate to -1), so doubles are rejected for id_col...
    df = spark.createDataFrame(
        [(1.2, "a", 1.0), (1.7, "a", 1.0)], "id double, h string, score double"
    )
    with pytest.raises(ValueError, match="id_col .* integral"):
        keep_best_representative(df, ["h"], "id", "score")
    # ...but stay fine for score_col
    df2 = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", 2.5)], "id long, h string, score double"
    )
    out = keep_best_representative(df2, ["h"], "id", "score").collect()
    assert [(r["keep_id"], r["keep_score"]) for r in out] == [(2, 2.5)]


def test_keep_best_is_single_aggregate_no_window(spark):
    plan = keep_best_representative(
        _docs(spark), ["h"], "id", "score"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # partial + final hash aggregate pair, one exchange on the cluster key
    assert plan.count("Exchange") == 1


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "old-text"), (3, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "new-text"), (4, "fresh")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", F.md5("text")).collect()
    }
    assert out == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "same")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "same")], "doc_id long, text string")
    rows = snapshot_diff(
        old, new, "doc_id", F.md5("text"), include_unchanged=True
    ).collect()
    assert [(r["doc_id"], r["status"]) for r in rows] == [(1, "unchanged")]
    assert (
        snapshot_diff(old, new, "doc_id", F.md5("text")).count() == 0
    )


def _parts(spark):
    return spark.createDataFrame(
        [
            (1, "t1", "red widget"),
            (2, "t1", "red widgets"),  # dist 1 to id 1
            (3, "t1", "blue bolt"),  # far from both
            (4, "t2", "red widget"),  # other block — never pairs with 1/2
            (5, "t2", "red widget"),  # exact dup of 4, dist 0
        ],
        "id long, blk string, name string",
    )


def test_fuzzy_pairs_within_blocks_only(spark):
    rows = blocked_fuzzy_pairs(
        _parts(spark), ["blk"], "id", "name", max_dist=2
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in rows}
    assert got == {(1, 2): 1, (4, 5): 0}


def test_fuzzy_pairs_block_cap_drops_whole_block(spark):
    # block t1 has 3 rows > cap 2 -> dropped entirely; t2 (2 rows) kept
    rows = blocked_fuzzy_pairs(
        _parts(spark), ["blk"], "id", "name", max_dist=2, max_block_rows=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(4, 5)}


def test_fuzzy_pairs_length_prefilter_is_sound(spark):
    # strings whose length gap exceeds max_dist can never pass the
    # levenshtein filter — prefilter must not change the answer
    df = spark.createDataFrame(
        [(1, "b", "ab"), (2, "b", "abcdefgh"), (3, "b", "abc")],
        "id long, blk string, name string",
    )
    rows = blocked_fuzzy_pairs(df, ["blk"], "id", "name", max_dist=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(1, 3)}


def test_fuzzy_pairs_arg_validation(spark):
    with pytest.raises(ValueError, match="max_dist"):
        blocked_fuzzy_pairs(_parts(spark), ["blk"], "id", "name", max_dist=-1)
    with pytest.raises(ValueError, match="max_block_rows"):
        blocked_fuzzy_pairs(
            _parts(spark), ["blk"], "id", "name", max_dist=1, max_block_rows=0
        )


def test_grouped_split_no_group_straddles(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import grouped_split

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 23).cast("string").alias("grp")
    )
    out = grouped_split(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_group = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)


def test_grouped_split_rejects_existing_out_col(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import grouped_split

    df = spark.range(3).select("id", F.lit("x").alias("split"))
    with pytest.raises(ValueError, match="already exists"):
        grouped_split(df, "id", {"a": 0.5, "b": 0.5})


def _cdc(spark):
    from hadoop_multiple_streaming_spark.operators.corpus import apply_changes

    snap = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id long, text string"
    )
    return apply_changes, snap


def test_apply_changes_upsert_delete_insert(spark):
    apply_changes, snap = _cdc(spark)
    changes = spark.createDataFrame(
        [
            (2, "TWO", "upsert", 1),
            (3, None, "delete", 1),
            (4, "four", "upsert", 1),
        ],
        "id long, text string, op string, seq long",
    )
    out = {r["id"]: r["text"] for r in apply_changes(snap, changes, "id").collect()}
    assert out == {1: "one", 2: "TWO", 4: "four"}


def test_apply_changes_highest_seq_wins_tie_to_delete(spark):
    apply_changes, snap = _cdc(spark)
    changes = spark.createDataFrame(
        [
            (2, "v1", "upsert", 1),
            (2, "v2", "upsert", 5),   # highest seq -> wins over delete at 3
            (2, None, "delete", 3),
            (3, "x", "upsert", 7),    # same seq as delete -> delete wins
            (3, None, "delete", 7),
        ],
        "id long, text string, op string, seq long",
    )
    out = {r["id"]: r["text"] for r in apply_changes(snap, changes, "id").collect()}
    assert out == {1: "one", 2: "v2"}


def test_apply_changes_rejects_bad_op_and_schema(spark):
    apply_changes, snap = _cdc(spark)
    bad_op = spark.createDataFrame(
        [(1, "x", "replace", 1)], "id long, text string, op string, seq long"
    )
    with pytest.raises(Exception, match="unknown op code|USER_RAISED_EXCEPTION"):
        apply_changes(snap, bad_op, "id").collect()
    missing = spark.createDataFrame([(1, "upsert", 1)], "id long, op string, seq long")
    with pytest.raises(ValueError, match="missing snapshot columns"):
        apply_changes(snap, missing, "id")
    float_seq = spark.createDataFrame(
        [(1, "x", "upsert", 1.0)], "id long, text string, op string, seq double"
    )
    with pytest.raises(ValueError, match="must be integral"):
        apply_changes(snap, float_seq, "id")


def test_apply_changes_roundtrips_snapshot_diff(spark):
    # apply_changes(old, diff-as-feed) must reconstruct new exactly
    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.operators.corpus import (
        apply_changes,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, text string"
    )
    diff = snapshot_diff(old, new, "id", F.md5("text"))
    feed = (
        diff.join(new, "id", "left")
        .select(
            "id",
            "text",
            F.when(F.col("status") == "removed", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
            F.lit(1).cast("long").alias("seq"),
        )
    )
    rebuilt = apply_changes(old, feed, "id")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))

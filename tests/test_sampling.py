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


def test_temperature_sample_flattens_dominant_group(spark):
    import math

    from hadoop_multiple_streaming_spark.functions.sampling import (
        temperature_sample,
    )

    # one dominant group (800) + two tail groups (100, 50)
    rows = (
        [(i, "big") for i in range(800)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "small") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    kept = temperature_sample(df, "doc_id", "grp", alpha=0.5).collect()
    by_grp = {}
    for r in kept:
        by_grp[r.grp] = by_grp.get(r.grp, 0) + 1
    # replay the documented integer quota arithmetic
    ns = {"big": 800, "mid": 100, "small": 50}
    ws = {g: math.floor(math.sqrt(n) * 1000) for g, n in ns.items()}
    W, T = sum(ws.values()), sum(ns.values())
    want = {g: min(ns[g], (T * ws[g]) // W) for g in ns}
    assert by_grp == want
    # the whole point: dominant group downsampled, tail kept whole
    assert by_grp["big"] < 800
    assert by_grp["mid"] == 100 and by_grp["small"] == 50
    # determinism: same rows on a rerun
    kept2 = temperature_sample(df, "doc_id", "grp", alpha=0.5).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in kept2)


def test_temperature_sample_explicit_target(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(i, "a") for i in range(90)] + [(100 + i, "b") for i in range(10)],
        "doc_id long, grp string",
    )
    kept = temperature_sample(df, "doc_id", "grp", alpha=0.5, target_total=20)
    # alpha=0.5: w_a = 9486, w_b = 3162 -> quotas (20*w) div W = 15, 5
    by_grp = {}
    for r in kept.collect():
        by_grp[r.grp] = by_grp.get(r.grp, 0) + 1
    assert by_grp == {"a": 15, "b": 5}


def test_temperature_sample_rejects_negative_alpha(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, grp string")
    with pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "doc_id", "grp", alpha=-1.0)


def test_upsample_epochs_multiplicities(spark):
    """Integer weights repeat exactly; fractional weights repeat the
    hash-chosen subset one extra time (expected multiplicity = w);
    weight 0 drops the source; default passes through once."""
    from hadoop_multiple_streaming_spark.functions.sampling import (
        SPACE,
        hash_value,
        upsample_epochs,
    )

    rows = [(i, "a" if i < 40 else ("b" if i < 60 else ("c" if i < 80 else "d")))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = upsample_epochs(df, {"a": 2.5, "b": 0.5, "c": 0.0}, "source", "doc_id")
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    # per-row check against the stated law
    hv = {r.doc_id: r.v for r in df.select(
        "doc_id", hash_value(F.col("doc_id")).alias("v")).collect()}
    th = int(0.5 * SPACE)
    want_a = sum(2 + (1 if hv[i] < th else 0) for i in range(40))
    want_b = sum(1 if hv[i] < th else 0 for i in range(40, 60))
    assert counts.get("a") == want_a
    assert counts.get("b", 0) == want_b
    assert "c" not in counts
    assert counts.get("d") == 20  # default weight 1.0
    # epoch index is 1-based and dense per row
    epochs = {r.epoch for r in out.where(F.col("source") == "a").collect()}
    assert epochs == {1, 2, 3} or epochs == {1, 2}
    import pytest

    with pytest.raises(ValueError, match="weight"):
        upsample_epochs(df, {"a": -1.0})


def test_priority_sample_exact_topk_and_plan(spark):
    """priority_sample == exact top-k by the same integer priorities
    computed independently in Python, is partition-count invariant,
    and plans as TakeOrderedAndProject (no sort shuffle)."""
    import hashlib

    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.functions.sampling import (
        _P_SCALE,
        priority_sample,
    )

    n, k = 400, 25
    df = (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        # weights 1..80, deterministic, with repeats (exercises ties)
        .withColumn("w", (F.col("doc_id") % 80 + 1).cast("long"))
    )
    out = priority_sample(df, "doc_id", "w", k=k)
    rows = out.collect()
    assert len(rows) == k

    # independent golden: same md5-nibble hash + integer div in Python
    def prio(doc_id, w):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        v = int(h[:6], 16)
        return (w * SPACE * _P_SCALE) // (v + 1)

    golden = sorted(
        ((prio(i, i % 80 + 1), i) for i in range(n)),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    got = sorted(((r.priority, r.doc_id) for r in rows),
                 key=lambda t: (-t[0], t[1]))
    assert got == [(p, i) for p, i in golden]

    # partition-count invariance (selection is a pure row property)
    rows7 = priority_sample(df.repartition(7), "doc_id", "w", k=k).collect()
    assert sorted(r.doc_id for r in rows7) == sorted(r.doc_id for r in rows)

    # plan: per-partition top-k + driver merge, no sort shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_priority_sample_small_n_and_validation(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import (
        priority_sample,
    )

    df = (
        spark.range(5)
        .withColumnRenamed("id", "doc_id")
        .withColumn("w", F.lit(3).cast("long"))
    )
    assert priority_sample(df, "doc_id", "w", k=50).count() == 5
    with pytest.raises(ValueError):
        priority_sample(df, "doc_id", "w", k=0)


def test_priority_sample_guards(spark):
    """ADVICE r10: float weights rejected (Spark cast truncates, DuckDB
    rounds — silent oracle divergence), reserved-column collision
    rejected, and int64 overflow raises instead of wrapping negative."""
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import (
        _P_SCALE,
        SPACE,
        priority_sample,
    )

    base = spark.range(5).withColumnRenamed("id", "doc_id")
    # float weight dtype -> TypeError before any job runs
    with pytest.raises(TypeError, match="integral"):
        priority_sample(base.withColumn("w", F.lit(1.5)), "doc_id", "w", 2)
    # pre-existing 'priority' column -> ValueError (no silent clobber)
    with pytest.raises(ValueError, match="priority"):
        priority_sample(
            base.withColumn("w", F.lit(1).cast("long")).withColumn(
                "priority", F.lit(0)
            ),
            "doc_id",
            "w",
            2,
        )
    # weight over the documented 2^63/(16^6*1024) ~ 5.4e8 bound ->
    # runtime raise_error, not silent int64 wraparound
    w_max = (2**63 - 1) // (SPACE * _P_SCALE)
    over = base.withColumn("w", F.lit(w_max + 1).cast("long"))
    with pytest.raises(Exception, match="int64 bound"):
        priority_sample(over, "doc_id", "w", 2).collect()
    # exactly at the bound is fine
    at = base.withColumn("w", F.lit(w_max).cast("long"))
    assert priority_sample(at, "doc_id", "w", 2).count() == 2


# ---- mixture_sample ----


def _mix_corpus(spark):
    # skewed groups: a=600, b=250, c=150
    rows = (
        [(i, "a") for i in range(600)]
        + [(1000 + i, "b") for i in range(250)]
        + [(2000 + i, "c") for i in range(150)]
    )
    return spark.createDataFrame(rows, "doc_id long, grp string")


def test_mixture_sample_hits_exact_proportions(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import mixture_sample

    df = _mix_corpus(spark)
    # target mixture 2:1:1 (W=4); max achievable target =
    # min(600*4//2, 250*4//1, 150*4//1) = min(1200, 1000, 600) = 600
    out = mixture_sample(df, "doc_id", "grp", {"a": 2, "b": 1, "c": 1})
    got = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # quotas: (600*2)//4=300, (600*1)//4=150, (600*1)//4=150
    assert got == {"a": 300, "b": 150, "c": 150}


def test_mixture_sample_drops_unlisted_groups_and_is_stable(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import mixture_sample

    df = _mix_corpus(spark)
    out1 = mixture_sample(df, "doc_id", "grp", {"a": 1, "b": 1})
    assert out1.where(F.col("grp") == "c").count() == 0
    # deterministic: same rows both runs
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {r["doc_id"] for r in mixture_sample(df, "doc_id", "grp", {"a": 1, "b": 1}).collect()}
    assert ids1 == ids2
    # growing the corpus never evicts: quota only grows, hash-rank
    # membership of existing rows is monotone under a larger target
    # (checked via explicit smaller target = subset of default target)
    small = mixture_sample(df, "doc_id", "grp", {"a": 1, "b": 1}, target_total=100)
    assert {r["doc_id"] for r in small.collect()} <= ids1


def test_mixture_sample_explicit_target_and_infeasible_raises(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hadoop_multiple_streaming_spark.functions.sampling import mixture_sample

    df = _mix_corpus(spark)
    out = mixture_sample(df, "doc_id", "grp", {"a": 1, "b": 1}, target_total=400)
    got = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 200, "b": 200}
    # c has 150 rows; 1:1:2 at target 1200 needs 600 c rows -> raise
    # (r13: at query construction — the quota arithmetic is driver-side)
    with pytest.raises(ValueError, match="infeasible mixture"):
        mixture_sample(
            df, "doc_id", "grp", {"a": 1, "b": 1, "c": 2}, target_total=1200
        )


def test_mixture_sample_validates_weights(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import mixture_sample

    df = _mix_corpus(spark)
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, "doc_id", "grp", {})
    with pytest.raises(ValueError, match="positive int"):
        mixture_sample(df, "doc_id", "grp", {"a": 0})
    with pytest.raises(ValueError, match="positive int"):
        mixture_sample(df, "doc_id", "grp", {"a": 1.5})  # type: ignore[dict-item]


# ---- global_shuffle ----


def test_global_shuffle_is_a_permutation_and_bucket_independent(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import global_shuffle

    df = ids_df(spark, 400)
    out = global_shuffle(df, "doc_id", seed=7, num_buckets=16)
    ords = sorted(r["ordinal"] for r in out.collect())
    assert ords == list(range(400))
    # bucket count never changes the permutation
    out1 = global_shuffle(df, "doc_id", seed=7, num_buckets=1)
    m16 = {r["doc_id"]: r["ordinal"] for r in out.collect()}
    m1 = {r["doc_id"]: r["ordinal"] for r in out1.collect()}
    assert m16 == m1


def test_global_shuffle_seed_changes_order_and_is_deterministic(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import global_shuffle

    df = ids_df(spark, 300)
    a = {r["doc_id"]: r["ordinal"] for r in global_shuffle(df, "doc_id", seed=1).collect()}
    b = {r["doc_id"]: r["ordinal"] for r in global_shuffle(df, "doc_id", seed=2).collect()}
    a2 = {r["doc_id"]: r["ordinal"] for r in global_shuffle(df, "doc_id", seed=1).collect()}
    assert a == a2
    assert a != b
    # and it is not the identity order
    assert any(a[k] != k for k in a)


def test_global_shuffle_rejects_column_collisions(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import global_shuffle

    df = ids_df(spark, 10).withColumn("ordinal", F.lit(0))
    with pytest.raises(ValueError, match="ordinal"):
        global_shuffle(df, "doc_id")


# ---- token_budget_select ----


def test_token_budget_select_prefix_semantics(spark):
    from hadoop_multiple_streaming_spark.functions.sampling import (
        token_budget_select,
    )

    # score order: d1(90) d2(80) d3(70) d4(60); tokens 5, 6, 4, 1
    # budget 10: d1 fits (5), d2 overflows (11) and STOPS the fill —
    # d3 (cum 15) and d4 (cum 16) must NOT slip in even though d4's
    # single token would fit the remaining 5.
    df = spark.createDataFrame(
        [(1, 90, 5), (2, 80, 6), (3, 70, 4), (4, 60, 1)],
        "doc_id long, score long, tok long",
    )
    out = token_budget_select(df, "doc_id", "score", "tok", budget=10)
    assert {r["doc_id"] for r in out.collect()} == {1}
    # budget exactly at a boundary keeps the boundary doc
    out2 = token_budget_select(df, "doc_id", "score", "tok", budget=11)
    assert {r["doc_id"] for r in out2.collect()} == {1, 2}


def test_token_budget_select_ties_and_validation(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import (
        token_budget_select,
    )

    # equal scores: doc_id breaks the tie (ascending)
    df = spark.createDataFrame(
        [(2, 50, 4), (1, 50, 4), (3, 50, 4)], "doc_id long, score long, tok long"
    )
    out = token_budget_select(df, "doc_id", "score", "tok", budget=8)
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
    with pytest.raises(TypeError, match="integral"):
        token_budget_select(
            df.withColumn("score", F.col("score").cast("double")),
            "doc_id",
            "score",
            "tok",
            budget=8,
        )
    with pytest.raises(ValueError, match="budget"):
        token_budget_select(df, "doc_id", "score", "tok", budget=-1)


def test_mixture_sample_rejects_non_string_group(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, grp long")
    with pytest.raises(TypeError, match="string"):
        mixture_sample(df, "doc_id", "grp", {"10": 1})


def test_token_budget_select_rejects_negative_tokens(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [(1, 50, 4), (2, 40, -1)], "doc_id long, score long, tok long"
    )
    # match the message, not the wrapper type: with the r15 shared
    # bucket exchange the bounds and window stages materialize
    # concurrently, so AQE may wrap the per-row raise_error in a
    # STAGE_MATERIALIZATION_MULTIPLE_FAILURES SparkException instead
    # of surfacing SparkRuntimeException directly
    with pytest.raises(Exception, match="negative tok"):
        token_budget_select(df, "doc_id", "score", "tok", budget=10).collect()


def test_mixture_sample_zero_row_weighted_group(spark):
    """ADVICE r11: a weighted group with no corpus rows must not be
    silently dropped from the quota arithmetic. Default target -> 0
    (empty result, not a skewed 100%-'a' mixture); explicit target ->
    the infeasibility raise_error fires."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hadoop_multiple_streaming_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a") for i in range(50)], "doc_id long, grp string"
    )
    # no 'b' rows at all: the largest achievable 1:1 mixture is empty
    assert mixture_sample(df, "doc_id", "grp", {"a": 1, "b": 1}).count() == 0
    with pytest.raises(ValueError, match="infeasible mixture"):
        mixture_sample(
            df, "doc_id", "grp", {"a": 1, "b": 1}, target_total=10
        )


def test_token_budget_select_narrow_int_min_score(spark):
    """ADVICE r11: an INT_MIN score in a narrow int column must rank
    LAST (lowest score), not wrap to the front of the fill order."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from hadoop_multiple_streaming_spark.functions.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [(1, 0, 5), (2, -(2**31), 5)], "doc_id long, score int, tok int"
    )
    out = token_budget_select(df, "doc_id", "score", "tok", budget=5)
    # budget fits one doc: the higher score (0) wins; pre-fix the
    # wrapped -INT_MIN ranked doc 2 first
    assert {r["doc_id"] for r in out.collect()} == {1}
    # Long.MIN_VALUE cannot be negated at all -> loud per-row error
    big = spark.createDataFrame(
        [(1, -(2**63), 5)], "doc_id long, score long, tok int"
    )
    # the raise_error may surface wrapped in a stage-materialization
    # SparkException (both prefix-sum branches hit it) — match the text
    with pytest.raises(Exception, match="Long.MIN_VALUE"):
        token_budget_select(big, "doc_id", "score", "tok", budget=5).collect()


# ---- subgroup-decomposed hash rank (the dominant-group pre-trim) ----


def test_grouped_hash_topk_membership_invariant_in_subgroups(spark):
    """The r12 scale fix must be INVISIBLE in the answer: quota /
    temperature / mixture keep bit-identical row sets at any
    num_subgroups (1 == the old whole-group window shape), on BOTH the
    decomposed plan (bypass floor dropped to 0, so the 900-row 'big'
    group counts as skewed) and the r13 single-window bypass plan
    (default floor — this corpus is far under it)."""
    from hadoop_multiple_streaming_spark.functions import sampling
    from hadoop_multiple_streaming_spark.functions.sampling import (
        mixture_sample,
        quota_sample,
        temperature_sample,
    )

    rows = (
        [(i, "big") for i in range(900)]
        + [(5000 + i, "mid") for i in range(80)]
        + [(9000 + i, "tiny") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    def ids(out):
        return sorted(r["doc_id"] for r in out.collect())

    orig = sampling._SKEW_BYPASS_ROWS
    want_q = ids(quota_sample(df, "doc_id", "grp", 37, num_subgroups=1))
    want_t = ids(temperature_sample(df, "doc_id", "grp", num_subgroups=1))
    want_m = ids(
        mixture_sample(
            df, "doc_id", "grp", {"big": 3, "mid": 2, "tiny": 1},
            num_subgroups=1,
        )
    )
    try:
        for floor in (orig, 0):
            sampling._SKEW_BYPASS_ROWS = floor
            for nsg in (1, 4, 64, 4096):
                assert ids(
                    quota_sample(df, "doc_id", "grp", 37, num_subgroups=nsg)
                ) == want_q, (floor, nsg)
                assert ids(
                    temperature_sample(df, "doc_id", "grp", num_subgroups=nsg)
                ) == want_t, (floor, nsg)
                assert ids(
                    mixture_sample(
                        df, "doc_id", "grp", {"big": 3, "mid": 2, "tiny": 1},
                        num_subgroups=nsg,
                    )
                ) == want_m, (floor, nsg)
    finally:
        sampling._SKEW_BYPASS_ROWS = orig


def test_grouped_hash_topk_validation(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.sampling import (
        quota_sample,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, grp string")
    # num_subgroups must divide 16^6
    with pytest.raises(ValueError, match="num_subgroups"):
        quota_sample(df, "doc_id", "grp", 5, num_subgroups=7)
    # internal temp name collision fails fast
    with pytest.raises(ValueError, match="_sg"):
        quota_sample(
            df.withColumn("_sg", F.lit(0)), "doc_id", "grp", 5
        )
    # _quota is reserved only in relation mode (mixture/temperature);
    # scalar quota_sample never materializes it on the corpus side
    from hadoop_multiple_streaming_spark.functions.sampling import (
        mixture_sample,
        temperature_sample,
    )

    with pytest.raises(ValueError, match="_quota"):
        mixture_sample(
            df.withColumn("_quota", F.lit(0)), "doc_id", "grp", {"a": 1}
        )
    with pytest.raises(ValueError, match="_quota"):
        temperature_sample(
            df.withColumn("_quota", F.lit(0)), "doc_id", "grp"
        )


def test_sampler_rank_window_partitions_by_subgroup(spark):
    """The 100 TB shape: the corpus rank window partitions by
    (group, _sg) — never by the bare group — and a pre-trim filter on
    the subgroup offset precedes it, so a dominant group can never
    become one whole-window partition."""
    import contextlib
    import io as _io

    from hadoop_multiple_streaming_spark.functions import sampling
    from hadoop_multiple_streaming_spark.functions.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 10 else "b") for i in range(1000)],
        "doc_id long, grp string",
    )
    # drop the absolute bypass floor so the 900-row dominant group
    # exercises the decomposed (at-scale) plan shape under test
    orig = sampling._SKEW_BYPASS_ROWS
    sampling._SKEW_BYPASS_ROWS = 0
    try:
        out = mixture_sample(df, "doc_id", "grp", {"a": 1, "b": 1})
    finally:
        sampling._SKEW_BYPASS_ROWS = orig
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the rank window's exchange carries both the group and _sg
    assert any(
        "hashpartitioning(grp" in l and "_sg" in l for l in plan.splitlines()
    ), plan
    # whole-group window exchanges (grp alone) must be gone from the
    # corpus rank; the only grp-only partitioning left is the tiny
    # offsets-relation window (input: the groupBy(grp, _sg) counts)
    assert "_goff" in plan  # the pre-trim offset join exists


def test_grouped_hash_topk_group_cardinality_guard(spark, monkeypatch):
    """r14 (VERDICT r13 missing #4): the per-group count collect is
    cardinality-guarded — a near-unique group column raises a clear
    error naming the column instead of OOMing the driver."""
    import pytest

    import hadoop_multiple_streaming_spark.functions.sampling as smp

    df = spark.createDataFrame(
        [(i, f"g{i}") for i in range(10)], "k long, grp string"
    )
    monkeypatch.setattr(smp, "_MAX_SAMPLE_GROUPS", 5)
    with pytest.raises(ValueError, match="'grp'"):
        smp.quota_sample(df, "k", "grp", quota=1)


def test_grouped_hash_topk_subgroup_cardinality_guard(spark, monkeypatch):
    """The skewed-regime (group, subgroup) count collect has its OWN
    cap of |max groups| x num_subgroups (ADVICE r14 #1): a corpus the
    per-group guard admits must not be rejected by the subgroup
    collect (it legitimately produces up to num_subgroups rows per
    group), but a genuinely oversized collect still raises."""
    import pytest

    import hadoop_multiple_streaming_spark.functions.sampling as smp

    rows = [(i, "a") for i in range(32)] + [(100 + i, "b") for i in range(4)]
    df = spark.createDataFrame(rows, "k long, grp string")
    # force the skewed regime (bypass floor 0; group a > total/2) with a
    # per-group cap the first |groups|=2 collect exactly meets; the 4
    # (group, subgroup) rows fit the 2 x 2 skew cap — the r14 code
    # reused the per-group cap here and wrongly raised
    monkeypatch.setattr(smp, "_SKEW_BYPASS_ROWS", 0)
    monkeypatch.setattr(smp, "_MAX_SAMPLE_GROUPS", 2)
    out = smp.quota_sample(df, "k", "grp", quota=1, num_subgroups=2)
    assert out.count() == 2  # one per group, skew path completes
    # the dedicated skew cap still guards: shrink it below the 4
    # populated (group, subgroup) rows and the collect must raise
    monkeypatch.setattr(smp, "_max_skew_count_rows", lambda n: 3)
    with pytest.raises(ValueError, match="subgroups"):
        smp.quota_sample(df, "k", "grp", quota=1, num_subgroups=2)


def test_max_skew_count_rows_int32_clamp():
    """The skew cap is clamped int32-safe (DataFrame.limit takes a Java
    int): a huge num_subgroups must not overflow the limit() call."""
    from hadoop_multiple_streaming_spark.functions.sampling import (
        _MAX_SAMPLE_GROUPS,
        _max_skew_count_rows,
    )

    assert _max_skew_count_rows(64) == _MAX_SAMPLE_GROUPS * 64
    assert _max_skew_count_rows(16**6) == 1 << 30

"""Sequence-packing semantics (functions.packing): contiguous
prefix-sum pack assignment — deterministic, overflow-by-one-doc,
group-parallel."""

from __future__ import annotations

from hadoop_multiple_streaming_spark.functions.packing import assign_packs, pack_stats


def test_assign_packs_contiguous(spark):
    # budget 10; docs in id order with token counts 4,4,4,9,2
    # start offsets: 0,4,8,12,21 -> packs 0,0,0,1,2
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 9), (5, 2)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: r.pack_id
        for r in assign_packs(df, "doc_id", "n_tokens", budget=10).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}


def test_assign_packs_partitioned_independent(spark):
    # each group's prefix sum is independent (parallel at scale)
    rows = [("en", 1, 6), ("en", 2, 6), ("zh", 1, 6), ("zh", 2, 6)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    got = {
        (r.lang, r.doc_id): r.pack_id
        for r in assign_packs(
            df, "doc_id", "n_tokens", budget=10, partition_cols=["lang"]
        ).collect()
    }
    assert got == {("en", 1): 0, ("en", 2): 0, ("zh", 1): 0, ("zh", 2): 0}


def test_pack_stats(spark):
    df = spark.createDataFrame(
        [("en", 1, 4), ("en", 2, 4), ("en", 3, 9)], "lang string, doc_id long, n_tokens long"
    )
    packed = assign_packs(df, "doc_id", "n_tokens", budget=8, partition_cols=["lang"])
    stats = {
        (r.lang, r.pack_id): (r.n_docs, r.pack_tokens)
        for r in pack_stats(packed, "n_tokens", ["lang"]).collect()
    }
    # starts: 0,4,8 -> packs 0,0,1
    assert stats == {("en", 0): (2, 8), ("en", 1): (1, 9)}


def test_packs_conserve_tokens_and_are_monotone(spark):
    # property: packing is a partition of the corpus — token totals are
    # conserved, pack ids are contiguous from 0, and pack starts are
    # monotone in doc order
    import random

    rng = random.Random(7)
    rows = [("en", i, rng.randint(1, 500)) for i in range(200)] + [
        ("zh", i, rng.randint(1, 500)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    packed = assign_packs(df, "doc_id", "n_tokens", budget=1000, partition_cols=["lang"])
    out = packed.collect()
    assert sum(r.n_tokens for r in out) == sum(r[2] for r in rows)
    by_lang = {}
    for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r.pack_id)
    for lang, ids in by_lang.items():
        assert ids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:])), lang


def test_assign_packs_rejects_bad_budget(spark):
    import pytest

    from hadoop_multiple_streaming_spark.functions.packing import (
        assign_packs_global,
    )

    df = spark.createDataFrame([(1, 4)], "doc_id long, n_tokens long")
    for bad in (0, -5):
        with pytest.raises(ValueError, match="budget must be positive"):
            assign_packs(df, "doc_id", "n_tokens", budget=bad)
        with pytest.raises(ValueError, match="budget must be positive"):
            assign_packs_global(df, "doc_id", "n_tokens", budget=bad)


def test_assign_packs_global_matches_naive_global_window(spark):
    # the two-pass bucketed prefix sum must be bit-identical to the
    # naive single-window global form, for any bucket count
    import random

    from hadoop_multiple_streaming_spark.functions.packing import (
        assign_packs_global,
    )

    rng = random.Random(11)
    rows = [(i, rng.randint(1, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    naive = {
        r.doc_id: r.pack_id
        for r in assign_packs(df, "doc_id", "n_tokens", budget=1000).collect()
    }
    for buckets in (1, 4, 32):
        got = {
            r.doc_id: r.pack_id
            for r in assign_packs_global(
                df, "doc_id", "n_tokens", budget=1000, num_buckets=buckets
            ).collect()
        }
        assert got == naive, f"num_buckets={buckets}"


def test_assign_packs_global_tiebreak_deterministic(spark):
    # duplicate order values: with tiebreak_col the pack ids must be
    # exactly those of a (order, tiebreak)-ordered sequential fill,
    # regardless of bucket count / shuffle order
    from hadoop_multiple_streaming_spark.functions.packing import (
        assign_packs_global,
    )

    # 40 rows, only 4 distinct order values, 10-way ties each
    rows = [(i, i % 4, 30) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp long, n_tokens long")
    # sequential fill in (grp, doc_id) order, budget 100
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    start, expect = 0, {}
    for doc_id, _, tok in ordered:
        expect[doc_id] = start // 100
        start += tok
    for buckets in (1, 3, 8):
        got = {
            r.doc_id: r.pack_id
            for r in assign_packs_global(
                df,
                "grp",
                "n_tokens",
                budget=100,
                num_buckets=buckets,
                tiebreak_col="doc_id",
            ).collect()
        }
        assert got == expect, f"num_buckets={buckets}"


def test_assign_packs_global_no_corpus_sized_global_window(spark):
    # the corpus-sized window must be PARTITIONED (by the range bucket);
    # the only unpartitioned window may run over the num_buckets-row
    # totals aggregate. We assert it structurally: every Window operator
    # that consumes the token column partitions by _b.
    import contextlib
    import io as _io

    from hadoop_multiple_streaming_spark.functions.packing import (
        assign_packs_global,
    )

    df = spark.createDataFrame([(i, 10) for i in range(50)], "doc_id long, n_tokens long")
    out = assign_packs_global(df, "doc_id", "n_tokens", budget=100, num_buckets=4)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    win_blocks = [
        b for b in plan.split("\n\n") if b.splitlines()[0].lstrip("(0123456789) *").startswith("Window")
    ]
    assert win_blocks, plan
    corpus_wins = [b for b in win_blocks if "n_tokens" in b]
    assert corpus_wins, win_blocks
    for b in corpus_wins:
        assert "_b" in b, f"corpus window not bucket-partitioned:\n{b}"


def test_pack_texts_materialization(spark):
    from hadoop_multiple_streaming_spark.functions.packing import pack_texts

    df = spark.createDataFrame(
        [("en", 2, "second", 0), ("en", 1, "first", 0), ("en", 3, "third", 1)],
        "lang string, doc_id long, text string, pack_id long",
    )
    got = {
        (r.lang, r.pack_id): (r.n_docs, r.packed_text)
        for r in pack_texts(df, "text", "doc_id", ["lang"]).collect()
    }
    assert got[("en", 0)] == (2, "first\n\nsecond")  # doc-id order, not input order
    assert got[("en", 1)] == (1, "third")


def test_chunk_documents_windows_and_overlap(spark):
    from hadoop_multiple_streaming_spark.functions.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # 7 tokens
            (2, "x y"),            # shorter than one chunk
            (3, ""),               # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    # chunk=4, stride=2: doc1 windows [a b c d][c d e f][e f g]
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs, "text", "doc_id", 4, 2).collect()
    }
    assert got == {
        (1, 0): ("a b c d", 4),
        (1, 1): ("c d e f", 4),
        (1, 2): ("e f g", 3),
        (2, 0): ("x y", 2),
    }
    # disjoint default stride: doc1 -> [a b c d][e f g]
    got2 = {
        (r.doc_id, r.chunk_id): r.chunk_text
        for r in chunk_documents(docs, "text", "doc_id", 4).collect()
    }
    assert got2 == {(1, 0): "a b c d", (1, 1): "e f g", (2, 0): "x y"}
    # stride > chunk (sampled windows): 8 tokens, chunk=2, stride=5
    # -> starts 0 and 5 only; the ceil formula alone would also emit an
    # EMPTY window at start 10 >= 8 (the round-6 ADVICE bug)
    docs8 = spark.createDataFrame(
        [(9, "a b c d e f g h")], "doc_id long, text string"
    )
    got3 = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs8, "text", "doc_id", 2, 5).collect()
    }
    assert got3 == {(9, 0): ("a b", 2), (9, 1): ("f g", 2)}
    import pytest

    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, "text", "doc_id", 0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, "text", "doc_id", 4, 0)


def test_global_running_total_matches_python_reference(spark):
    # randomized cross-check of the two-pass range-bucketed prefix sum
    # against a plain-Python cumsum, with duplicate order keys (the
    # tiebreak contract) and several bucket counts
    import random

    from hadoop_multiple_streaming_spark.functions.packing import (
        global_running_total,
    )

    rng = random.Random(1234)
    rows = [
        (i, rng.randrange(0, 50), rng.randrange(0, 9))  # dup-heavy order col
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, ord long, val long")
    expect = {}
    acc = 0
    for i, o, v in sorted(rows, key=lambda r: (r[1], r[0])):
        expect[i] = acc
        acc += v
    for nb in (1, 7, 32):
        got = {
            r["id"]: r["cum"]
            for r in global_running_total(
                df, "ord", "val", num_buckets=nb, tiebreak_col="id", out_col="cum"
            ).collect()
        }
        assert got == expect, f"num_buckets={nb} diverged"


def test_global_running_total_rejects_reserved_columns(spark):
    """ADVICE r11: inputs already carrying an internal temp name (_bs,
    _b, _local_start, _off) or the out_col must fail fast instead of
    silently corrupting the prefix sum."""
    import pytest
    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.functions.packing import (
        global_running_total,
    )

    base = (
        spark.range(10)
        .withColumnRenamed("id", "ord")
        .withColumn("val", F.lit(1).cast("long"))
    )
    for bad in ("_bs", "_b", "_local_start", "_off"):
        with pytest.raises(ValueError, match=bad):
            global_running_total(
                base.withColumn(bad, F.lit(0)), "ord", "val"
            )
    with pytest.raises(ValueError, match="cum"):
        global_running_total(
            base.withColumn("cum", F.lit(0)), "ord", "val", out_col="cum"
        )
    with pytest.raises(ValueError, match="internal temp"):
        global_running_total(base, "ord", "val", out_col="_b")


def test_global_running_total_autosizes_buckets_and_warns_on_skew(spark):
    """r12: num_buckets=None resolves from defaultParallelism (answers
    are bucket-count independent, so only the mechanism needs pinning),
    and warn_skew=True flags an order column whose hot value collapses
    percentile boundaries."""
    import warnings

    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.functions.packing import (
        global_running_total,
    )

    df = (
        spark.range(500)
        .withColumnRenamed("id", "doc_id")
        .withColumn("val", F.lit(1).cast("long"))
    )
    # auto-sized default matches an explicit bucket count exactly
    auto = {
        r["doc_id"]: r["cum"]
        for r in global_running_total(
            df, "doc_id", "val", tiebreak_col="doc_id", out_col="cum"
        ).collect()
    }
    assert auto == {i: i for i in range(500)}

    # 90% of rows share one order value -> boundaries collapse -> warn
    skewed = df.withColumn(
        "ord", F.when(F.col("doc_id") % 10 < 9, F.lit(7)).otherwise(F.col("doc_id"))
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        global_running_total(
            skewed, "ord", "val", tiebreak_col="doc_id", warn_skew=True
        )
        assert any("heavy" in str(x.message) for x in w), [str(x.message) for x in w]
    # a dispersed key does not warn
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        global_running_total(
            df, "doc_id", "val", tiebreak_col="doc_id", warn_skew=True
        )
        assert not any("heavy" in str(x.message) for x in w)


def test_global_running_total_order_space_matches_percentile_path(spark):
    """r15: the static-range bucketing (order_space) must return the
    IDENTICAL prefix sums as the percentile-sketch path for any bucket
    count — bucketing is plan-only — including duplicate order keys,
    NULL-order rows (bucket 0, NULLS-FIRST order, matching the
    percentile path's filter-false semantics), and negative values."""
    import random

    from hadoop_multiple_streaming_spark.functions.packing import (
        global_running_total,
    )

    rng = random.Random(77)
    rows = [
        (i, rng.randrange(0, 1000), rng.randrange(-5, 20)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, ord long, val long")
    baseline = {
        r["id"]: r["cum"]
        for r in global_running_total(
            df, "ord", "val", num_buckets=16, tiebreak_col="id", out_col="cum"
        ).collect()
    }
    for nb in (1, 5, 16, 64):
        got = {
            r["id"]: r["cum"]
            for r in global_running_total(
                df, "ord", "val", num_buckets=nb, tiebreak_col="id",
                out_col="cum", order_space=1000,
            ).collect()
        }
        assert got == baseline, f"order_space path diverged at num_buckets={nb}"
    # NULL order keys: sort first (NULLS FIRST), bucket 0 on both paths
    rows_n = [(0, None, 7), (1, 3, 2), (2, 1, 5)]
    dfn = spark.createDataFrame(rows_n, "id long, ord long, val long")
    for kw in ({}, {"order_space": 10}):
        got = {
            r["id"]: r["cum"]
            for r in global_running_total(
                dfn, "ord", "val", num_buckets=4, tiebreak_col="id",
                out_col="cum", **kw,
            ).collect()
        }
        assert got == {0: 0, 2: 7, 1: 12}, f"NULL-order handling diverged ({kw})"


def test_global_running_total_reuses_bucket_exchange(spark):
    """r15 plan pin: the totals branch must REUSE the prefix window's
    bucket exchange (the column-parity struct-max + non-null _b design)
    — a regression here silently re-runs the entire input lineage.
    Asserted on the executed AQE plan."""
    from hadoop_multiple_streaming_spark.functions.packing import (
        global_running_total,
    )

    df = spark.range(0, 5000).selectExpr(
        "id", "id % 997 as ord", "id % 13 as val"
    )
    out = global_running_total(
        df, "ord", "val", num_buckets=8, tiebreak_col="id", out_col="cum",
        order_space=997,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==", 1)[0]
    assert "ReusedExchange" in final, "totals branch no longer reuses the bucket exchange"
    # exactly ONE real shuffle of the input (the bucket exchange);
    # static order_space means no percentile-bounds subtree either.
    # (ReusedExchange lines NAME the exchange they reuse, so count
    # only lines that are themselves an Exchange operator.)
    real = [
        ln
        for ln in final.splitlines()
        if "Exchange hashpartitioning" in ln and "ReusedExchange" not in ln
    ]
    assert len(real) == 1, final

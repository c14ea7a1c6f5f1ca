"""Tests for the Bloom-prefiltered exact anti-join (operators.bloom)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.operators.bloom import (
    BloomFilterSpec,
    bloom_anti_join,
    build_bloom,
    might_contain,
)


def _corpus(spark, n=600):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("key"), (F.col("id") % 211).cast("string")).alias("k"),
    )


def _probes(spark):
    # every key ending in 0..3 of the 211-key space, with duplicates
    rows = [(f"key{i}",) for i in range(211) if i % 10 < 4] * 2
    return spark.createDataFrame(rows, "pk string")


def test_build_bloom_has_no_false_negatives(spark):
    probes = _probes(spark)
    bloom = build_bloom(probes, "pk")
    bf = spark.createDataFrame([(bloom.words,)], "bf array<bigint>")
    checked = probes.join(F.broadcast(bf)).select(
        might_contain(F.col("pk"), F.col("bf"), bloom).alias("hit")
    )
    assert checked.where(~F.col("hit")).count() == 0  # the Bloom law


def test_build_bloom_fpp_is_small(spark):
    probes = _probes(spark)
    bloom = build_bloom(probes, "pk")
    assert bloom.fpp < 0.01
    # disjoint key space: observed false-positive rate near the bound
    others = spark.range(5000).select(
        F.concat(F.lit("absent"), F.col("id").cast("string")).alias("k")
    )
    bf = spark.createDataFrame([(bloom.words,)], "bf array<bigint>")
    hits = (
        others.join(F.broadcast(bf))
        .where(might_contain(F.col("k"), F.col("bf"), bloom))
        .count()
    )
    assert hits / 5000 < 0.05, hits


def test_bloom_anti_join_matches_plain_anti_join(spark):
    corpus = _corpus(spark)
    probes = _probes(spark)
    spec = build_bloom(probes, "pk")
    got = bloom_anti_join(corpus, "k", probes, "pk", bloom=spec)
    want = corpus.join(
        probes.select(F.col("pk")), corpus.k == F.col("pk"), "left_anti"
    )
    g = sorted(r.doc_id for r in got.collect())
    w = sorted(r.doc_id for r in want.collect())
    assert g == w and len(g) > 0
    assert got.columns == corpus.columns
    # the cost gate: no spec -> the plain LeftAnti itself (no screen)
    plain = bloom_anti_join(corpus, "k", probes, "pk")
    assert sorted(r.doc_id for r in plain.collect()) == w
    pstr = plain._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in pstr
    # forcing a tiny bitmap (high FPR) cannot change the ANSWER — only
    # how many rows route through the verify join
    tiny = bloom_anti_join(
        corpus, "k", probes, "pk",
        bloom=build_bloom(probes, "pk", num_bits=1024, num_hashes=2),
    )
    assert sorted(r.doc_id for r in tiny.collect()) == w


def test_bloom_anti_join_validation(spark):
    corpus = _corpus(spark).withColumn("_bloom_pk", F.lit(0))
    with pytest.raises(ValueError, match="_bloom_pk"):
        bloom_anti_join(corpus, "k", _probes(spark), "pk")
    with pytest.raises(ValueError, match="num_hashes"):
        build_bloom(_probes(spark), "pk", num_hashes=0)
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(_probes(spark), "pk", num_bits=100)


def test_bloom_spec_fpp_formula():
    spec = BloomFilterSpec(words=[], num_bits=16 * 1000, num_hashes=5, n_keys=1000)
    assert 0 < spec.fpp < 0.01


def test_bloom_prefilter_stays_below_anti_join(spark):
    """Catalyst's PushLeftSemiLeftAntiThroughJoin would re-hoist the
    bitmap test above the anti-join (full-corpus shuffle, prefilter
    wasted); the Arrow identity barrier pins it. Assert on the
    OPTIMIZED plan: the LeftAnti's corpus-side subtree contains the
    Arrow node (so its input is the prefiltered sliver)."""
    corpus = _corpus(spark)
    probes = _probes(spark)
    out = bloom_anti_join(
        corpus, "k", probes, "pk", bloom=build_bloom(probes, "pk")
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    anti_at = plan.find("LeftAnti")
    arrow_at = plan.find("MapInPandas")
    assert anti_at != -1 and arrow_at != -1
    # toString prints parents first: the barrier must print AFTER
    # (deeper than) the anti join, i.e. inside its subtree
    assert arrow_at > anti_at, plan[:1500]


def test_bloom_screen_and_persistence(spark, tmp_path):
    from hadoop_multiple_streaming_spark.operators.bloom import (
        bloom_screen,
        load_bloom,
        save_bloom,
    )

    corpus = _corpus(spark)
    probes = _probes(spark)
    bloom = build_bloom(probes, "pk")
    path = str(tmp_path / "bloom")
    save_bloom(spark, bloom, path)
    loaded = load_bloom(spark, path)
    assert loaded == bloom
    kept = bloom_screen(corpus, "k", loaded)
    # every kept row is a TRUE non-member (no false negatives means
    # nothing in the probe set can survive the screen)
    probe_keys = {r.pk for r in probes.collect()}
    assert all(r.k not in probe_keys for r in kept.collect())
    # and the screen keeps most clean rows (fpp is small)
    n_clean = corpus.where(~corpus.k.isin(list(probe_keys))).count()
    assert kept.count() >= 0.9 * n_clean
    # the pre-built spec also feeds the exact join (build skipped)
    exact = bloom_anti_join(corpus, "k", probes, "pk", bloom=loaded)
    want = corpus.join(
        probes.withColumnRenamed("pk", "pt"), corpus.k == F.col("pt"), "left_anti"
    )
    assert sorted(r.doc_id for r in exact.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_compact_bloom_store_preserves_answers(spark, tmp_path):
    import glob

    from hadoop_multiple_streaming_spark.operators.bloom import (
        build_bloom,
        compact_bloom_store,
        load_bloom,
        merge_blooms,
        save_bloom,
    )

    store = str(tmp_path / "bstore")
    keysets = [["a", "b"], ["c"], ["d", "e", "f"]]
    for i, ks in enumerate(keysets):
        bl = build_bloom(
            spark.createDataFrame([(k,) for k in ks], "k string"),
            "k",
            num_bits=1024,
        )
        save_bloom(spark, bl, f"{store}/batch_id={i}")
    older = merge_blooms(
        *[load_bloom(spark, f"{store}/batch_id={i}") for i in (0, 1)]
    )
    merged = compact_bloom_store(spark, store)
    dirs = sorted(glob.glob(store + "/batch_id=*"))
    # the NEWEST batch (2) survives untouched: ingest_bloom_batch's
    # replay guard needs it addressable by its own batch_id
    assert sorted(d.rsplit("=", 1)[1] for d in dirs) == ["-1", "2"]
    assert load_bloom(spark, f"{store}/batch_id=-1").words == older.words
    assert merged.words == older.words
    # a second compaction has only {-1} foldable (2 is still newest):
    # no-op, store unchanged
    assert compact_bloom_store(spark, store) is None
    assert sorted(
        d.rsplit("=", 1)[1] for d in glob.glob(store + "/batch_id=*")
    ) == ["-1", "2"]
    # after batch 3 arrives, {-1, 2} fold into -2 and 3 survives
    bl3 = build_bloom(
        spark.createDataFrame([("g",)], "k string"), "k", num_bits=1024
    )
    save_bloom(spark, bl3, f"{store}/batch_id=3")
    merged2 = compact_bloom_store(spark, store)
    dirs2 = sorted(glob.glob(store + "/batch_id=*"))
    assert sorted(d.rsplit("=", 1)[1] for d in dirs2) == ["-2", "3"]
    want = merge_blooms(
        older, build_bloom(
            spark.createDataFrame([(k,) for k in keysets[2]], "k string"),
            "k", num_bits=1024,
        ),
    )
    assert merged2.words == want.words


def test_compact_bloom_store_geometry_mismatch_raises(spark, tmp_path):
    """r14 (VERDICT r13 missing #4): the compaction fold is distributed
    (posexplode + bit_or groupBy, one merged bitmap ever on the driver)
    — and mixed-geometry batches must fail loudly, mirroring
    merge_blooms, not OR silently-wrong bitmaps."""
    import pytest

    from hadoop_multiple_streaming_spark.operators.bloom import (
        build_bloom,
        compact_bloom_store,
        save_bloom,
    )

    store = str(tmp_path / "bstore")
    for i, bits in enumerate((1024, 2048, 1024)):
        bl = build_bloom(
            spark.createDataFrame([(f"k{i}",)], "k string"), "k", num_bits=bits
        )
        save_bloom(spark, bl, f"{store}/batch_id={i}")
    with pytest.raises(ValueError, match="geometry mismatch"):
        compact_bloom_store(spark, store)

"""Property-based tests: the splitKeyVal/join line-semantics contract
checked against a plain-Python reference implementation over
hypothesis-generated lines (SURVEY §5's property-testing leg).

Strategy: generate a batch of adversarial lines per property, evaluate
the Column expressions over ONE DataFrame, compare row-by-row with the
reference — one Spark job per property, not per example."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hadoop_multiple_streaming_spark.functions.kv import join_key_val, split_key_val

# printable-ish text including separators and unicode, no newlines
# (a line is by definition newline-free)
line_text = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", blacklist_categories=("Cs",)),
    max_size=40,
)


def ref_split(line: str, sep: str, k: int) -> tuple[str, str]:
    """Reference splitKeyVal (MultiPipeMapRed.java:403-425): key = the
    first k separator-delimited fields; if the line has fewer than k
    separators, the whole line is the key and the value is empty."""
    parts = line.split(sep)
    if len(parts) > k:
        return sep.join(parts[:k]), sep.join(parts[k:])
    return line, ""


def run_split(spark, lines: list[str], sep: str, k: int) -> list[tuple[str, str]]:
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    key, value = split_key_val("line", sep, k)
    out = df.select("line", key.alias("k"), value.alias("v")).collect()
    by_line = {}
    for r in out:
        by_line.setdefault(r.line, (r.k, r.v))
    return [by_line[l] for l in lines]


@settings(max_examples=8, deadline=None)
@given(st.lists(line_text, min_size=1, max_size=40))
def test_split_matches_reference_tab_k1(spark, lines):
    got = run_split(spark, lines, "\t", 1)
    assert got == [ref_split(l, "\t", 1) for l in lines]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(line_text, min_size=1, max_size=25),
    st.integers(min_value=1, max_value=4),
)
def test_split_matches_reference_multi_field(spark, lines, k):
    got = run_split(spark, lines, "\t", k)
    assert got == [ref_split(l, "\t", k) for l in lines]


@settings(max_examples=6, deadline=None)
@given(st.lists(line_text, min_size=1, max_size=25), st.sampled_from([",", "|", "::"]))
def test_split_matches_reference_custom_sep(spark, lines, sep):
    got = run_split(spark, lines, sep, 1)
    assert got == [ref_split(l, sep, 1) for l in lines]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef é中", max_size=10),
            st.text(alphabet="xyz\t 0123", max_size=10),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_join_then_split_roundtrip(spark, pairs):
    # keys must not contain the separator for the roundtrip to hold
    # (same constraint as Hadoop's text framing)
    df = spark.createDataFrame(pairs, "key string, value string")
    line = join_key_val("key", "value", "\t")
    k2, v2 = split_key_val(line, "\t", 1)
    out = df.select("key", "value", k2.alias("k"), v2.alias("v")).collect()
    for r in out:
        assert (r.k, r.v) == (r.key, r.value)


# ---- round-6 operator properties ----

token_word = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(token_word, min_size=0, max_size=30),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_chunk_documents_cover_and_stride_property(spark, toks, chunk, stride):
    """Every chunk equals the reference window slice, chunks jointly
    cover all tokens, and disjoint-stride chunks concatenate back to
    the original token sequence."""
    from hadoop_multiple_streaming_spark.functions.packing import chunk_documents

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_documents(df, "text", "doc_id", chunk, stride).collect()
    )
    # python reference
    if toks:
        import math

        nc = min(
            max(math.ceil((len(toks) - chunk) / stride), 0) + 1,
            (len(toks) - 1) // stride + 1,  # starts strictly below n only
        )
        want = [
            (i, " ".join(toks[i * stride : i * stride + chunk])) for i in range(nc)
        ]
    else:
        want = []
    assert got == want
    # no chunk is ever empty (stride > chunk must not emit a window
    # starting past the last token)
    assert all(t for _, t in got)
    if toks and stride >= chunk:
        # disjoint windows at stride == chunk reassemble the doc
        if stride == chunk:
            assert " ".join(t for _, t in got).split() == toks


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=6), st.integers(min_value=0, max_value=9)),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_salted_join_identity_property(spark, fact_rows, buckets):
    """salted_join == plain join for any fact multiset / salt count."""
    from hadoop_multiple_streaming_spark.operators.shuffle import salted_join

    fact = spark.createDataFrame(
        [(k, v) for k, v in fact_rows], "k long, v long"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 5)], "k long, name string"
    )
    got = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(fact, dim, "k", salt_buckets=buckets).collect()
    )
    want = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    assert got == want


# ---- round-7 operator properties ----


@settings(max_examples=6, deadline=None)
@given(
    st.lists(token_word, min_size=2, max_size=25),
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=3),
)
def test_substring_matches_finds_planted_slice_property(
    spark, toks, start, length, k
):
    """A probe cut verbatim from a document is ALWAYS found at its
    position (both anchor modes), and every reported match verifies
    against a plain-Python containment scan."""
    from hadoop_multiple_streaming_spark.operators.dedup import substring_matches

    start = min(start, len(toks) - 1)
    probe_toks = toks[start : start + length]
    if len(probe_toks) < k:
        return  # probe shorter than the anchor: operator skips it
    corpus = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    probes = spark.createDataFrame(
        [(9, " ".join(probe_toks))], "doc_id long, text string"
    )
    # python reference: all 1-based positions where the probe occurs
    want = {
        (1, 9, i + 1)
        for i in range(len(toks) - len(probe_toks) + 1)
        if toks[i : i + len(probe_toks)] == probe_toks
    }
    for mode in ("rarest", "first"):
        got = {
            (r.corpus_id, r.probe_id, r.match_pos)
            for r in substring_matches(corpus, probes, k=k, anchor=mode).collect()
        }
        assert got == want, (mode, toks, probe_toks, k)
        assert (1, 9, start + 1) in got  # the planted occurrence itself


@settings(max_examples=6, deadline=None)
@given(
    st.lists(token_word, min_size=1, max_size=20),
    st.lists(
        st.tuples(st.integers(1, 20), st.integers(1, 5)),
        min_size=0,
        max_size=4,
    ),
)
def test_remove_spans_complement_property(spark, toks, ivs):
    """remove_spans keeps exactly the tokens NO interval covers, in
    order, with exact removal accounting."""
    from hadoop_multiple_streaming_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    matches = spark.createDataFrame(
        [(1, s, l) for s, l in ivs],
        "corpus_id long, match_pos long, span_tokens long",
    )
    covered = {
        i
        for s, l in ivs
        for i in range(s, s + l)
    }
    want = [t for j, t in enumerate(toks, start=1) if j not in covered]
    r = remove_spans(docs, matches).collect()[0]
    assert r.clean_text == " ".join(want)
    assert r.n_tokens == len(want)
    assert r.n_removed == len(toks) - len(want)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40),
    st.floats(min_value=0.0, max_value=3.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=3.0, allow_nan=False),
)
def test_upsample_epochs_multiplicity_property(spark, sources, wa, wb):
    """Every row's emitted multiplicity equals floor(w) + (1 iff
    hash(id) < floor(frac(w) * 16^6)) for arbitrary weights, with
    dense 1-based epoch indices."""
    import math

    from pyspark.sql import functions as F

    from hadoop_multiple_streaming_spark.functions.sampling import (
        SPACE,
        hash_value,
        upsample_epochs,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sources)], "doc_id long, source string"
    )
    weights = {"a": wa, "b": wb}  # "c" takes the default 1.0
    out = upsample_epochs(df, weights, "source", "doc_id").collect()
    hv = {
        r.doc_id: r.v
        for r in df.select("doc_id", hash_value(F.col("doc_id")).alias("v")).collect()
    }

    def reps(w, i):
        fl = int(math.floor(w))
        return fl + (1 if hv[i] < int((w - fl) * SPACE) else 0)

    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.epoch)
    for i, s in enumerate(sources):
        want = reps(weights.get(s, 1.0), i)
        assert sorted(got.get(i, [])) == list(range(1, want + 1)), (s, i)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 20),
    st.sampled_from([1, 4, 64]),
)
def test_grouped_hash_topk_matches_python_reference(spark, rows, quota, nsg):
    """The subgroup-decomposed hash rank (r12 skew fix) against a plain
    Python golden: per group, keep the `quota` smallest
    (md5-nibble-hash, key) rows — exact membership at every subgroup
    count, on arbitrary corpora. The bypass floor is dropped to 0 so
    the DECOMPOSED plan is what the golden exercises (the r13 bypass
    path is the plain window, covered by the invariance test)."""
    import hashlib

    from hadoop_multiple_streaming_spark.functions import sampling
    from hadoop_multiple_streaming_spark.functions.sampling import (
        quota_sample,
    )

    df = spark.createDataFrame(rows, "doc_id long, grp string")
    orig = sampling._SKEW_BYPASS_ROWS
    sampling._SKEW_BYPASS_ROWS = 0
    try:
        got = {
            (r.grp, r.doc_id)
            for r in quota_sample(
                df, "doc_id", "grp", quota, num_subgroups=nsg
            ).collect()
        }
    finally:
        sampling._SKEW_BYPASS_ROWS = orig

    def hv(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:6], 16)

    want = set()
    by_grp = {}
    for doc_id, grp in rows:
        by_grp.setdefault(grp, []).append(doc_id)
    for grp, ids in by_grp.items():
        ids.sort(key=lambda i: (hv(i), i))
        want |= {(grp, i) for i in ids[:quota]}
    assert got == want

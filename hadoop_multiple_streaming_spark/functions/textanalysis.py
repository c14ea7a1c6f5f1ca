"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. Pure Column
expressions (JVM-side, codegen) — no Python UDFs in any hot path.

Each function's semantics are deliberately SQL-replicable (md5-based
hashing, integer-sum-then-divide ratios) so DuckDB oracles can verify
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# marker stopwords per language for the n-gram/stopword langid
# heuristic; alphabetical lang order is the documented tie-break
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "los", "y", "es", "que", "un", "una"],
    "fr": ["le", "les", "et", "est", "pas", "une", "dans"],
    "zh": ["的", "是", "不", "了", "在"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]

#: portable token pattern (same semantics in Java regex and RE2)
TOKEN_PATTERN = "[A-Za-z0-9]+"


def _tokens(text_col: str) -> str:
    return f"array_remove(split({text_col}, ' '), '')"


def ws_token_count(text_col: str) -> Column:
    """Whitespace token count (empty tokens excluded)."""
    return F.expr(f"size({_tokens(text_col)})").cast("long")


def regex_token_count(text_col: str) -> Column:
    """BPE-ish pre-tokenizer count: alphanumeric runs."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), F.lit(0))).cast(
        "long"
    )


def marker_score(text_col: str, markers: list[str]) -> Column:
    """How many tokens are in the marker list (with repeats)."""
    arr = ", ".join("'" + m.replace("'", "''") + "'" for m in markers)
    return F.expr(
        f"size(filter({_tokens(text_col)}, t -> array_contains(array({arr}), t)))"
    ).cast("long")


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score each language's marker list,
    pick the argmax (ties broken by alphabetical language code).
    Adds ``score_<lang>`` columns and ``predicted_lang``."""
    out = df
    for lang in sorted(LANG_MARKERS):
        out = out.withColumn(f"score_{lang}", marker_score(text_col, LANG_MARKERS[lang]))
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:  # first (alphabetical) hit of the max wins
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return out.withColumn("predicted_lang", pred)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/word counts, average word length,
    stopword ratio, non-alphanumeric ratio, and a composite score in
    [0, 1]. All ratios divide exact integer sums — deterministic."""
    toks = _tokens(text_col)
    n_words = F.expr(f"size({toks})").cast("long")
    sum_word_len = F.expr(
        f"aggregate(transform({toks}, t -> length(t)), 0L, (a, x) -> a + x)"
    )
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(
        f"size(filter({toks}, t -> array_contains(array({stop_arr}), t)))"
    ).cast("long")
    n_nonalnum = F.length(
        F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", "")
    ).cast("long")
    out = (
        df.withColumn("n_chars_text", F.length(text_col).cast("long"))
        .withColumn("n_words", n_words)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, sum_word_len.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "nonalnum_ratio",
            F.when(
                F.length(text_col) > 0,
                n_nonalnum.cast("double") / F.length(text_col).cast("long"),
            ).otherwise(F.lit(0.0)),
        )
    )
    # composite: length credit (capped at 200 words) x (1 - excess
    # stopword mass) x (1 - punctuation mass); deterministic doubles
    score = (
        F.least(F.col("n_words").cast("double") / 200.0, F.lit(1.0))
        * (F.lit(1.0) - F.col("stopword_ratio") / 2.0)
        * (F.lit(1.0) - F.col("nonalnum_ratio"))
    )
    return out.withColumn("quality_score", score)


def content_fingerprint(text_col: str = "text") -> Column:
    """Exact-content fingerprint: md5 of the whitespace-normalized,
    lowercased text."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))


def min_shingle_fingerprint(text_col: str = "text", n: int = 3) -> Column:
    """Rolling-window fingerprint: the minimum md5 over word n-gram
    shingles (a 1-hash MinHash — robust to small edits, cheap at
    scale). NULL when the doc has fewer than n tokens."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> md5(array_join(slice(split({text_col}, ' '), i, {n}), ' '))))"
    )


def sentence_udtf():
    """Python UDTF (Spark 4 table function) splitting text into
    sentence rows — the UDTF leg of the reference's §2.7 surface (a
    mapper executable emitting 0..n records per input is exactly a
    table function; this is the in-process flavor of the pipe
    operator's flat-map). Arrow-batched (useArrow), but still Python
    per row: use for the long tail of custom logic, not for anything
    expressible as explode(split(...)) — the oracle-twin query shows
    the two produce identical results.

    Returned lazily (a factory) so importing this module doesn't
    require an active SparkSession.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, n_tokens: int", useArrow=True)
    class SplitSentences:
        def eval(self, text: str):
            for s in (text or "").split(". "):
                if s:
                    yield s, len(s.split(" "))

    return SplitSentences


def grouped_token_partials(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Per-group PARTIAL sums of the whitespace-segment token count
    (``spaces + 1`` — empty segments included, the dashboard formula
    ``length(t) - length(replace(t, ' ', '')) + 1``): returns
    (group_col, _tok) partial rows, at most one per (input batch,
    group). Sum the partials (``groupBy``/``rollup`` + ``sum``) for
    exact totals; NULL text contributes nothing on either engine (the
    kernel nulls it out; SUM skips nulls).

    ``impl='arrow'`` (default) counts spaces with pyarrow's
    ``count_substring`` — a memchr-speed C kernel over the Arrow
    buffers — and pre-aggregates per batch, so only group-cardinality
    partials return to the JVM. Measured 1.4x over the best
    whole-stage-codegen form at sf4.0 (0.88 s vs 1.24 s for
    length-replace; string search in UTF8String is the JVM's cost,
    not the regex — see CROSSOVER.md r13). ``impl='expr'`` is the
    pure-JVM twin (``size(split(t, ' ', -1))`` — -1 keeps trailing
    empties, preserving the spaces+1 identity), asserted identical in
    tests; prefer it where a Python worker pool is unavailable.
    """
    if impl == "expr":
        t = F.col(text_col)
        return df.select(
            F.col(group_col),
            F.size(F.split(t, " ", -1)).cast("long").alias("_tok"),
        )
    if impl != "arrow":
        raise ValueError(f"grouped_token_partials: unknown impl {impl!r}")

    def gen(it):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in it:
            # explicit type: an all-null batch would otherwise infer
            # arrow type 'null', which count_substring has no kernel for
            arr = pa.Array.from_pandas(pdf[text_col], type=pa.string())
            toks = pc.if_else(
                pc.is_null(arr),
                pa.scalar(None, pa.int64()),
                pc.add(pc.count_substring(arr, " ").cast(pa.int64()), 1),
            )
            out = pd.DataFrame(
                {group_col: pdf[group_col], "_tok": toks.to_pandas()}
            )
            # min_count=1: an all-NULL-text group yields a NULL partial
            # (pandas' default sum would emit 0), keeping SUM-of-partials
            # NULL like SQL SUM over an all-NULL group.
            yield out.groupby(group_col, dropna=False, as_index=False)[
                "_tok"
            ].sum(min_count=1)

    # Derive the group field's type from the input schema — hardcoding
    # 'string' would silently mis-declare an int/bigint group column.
    out_schema = T.StructType(
        [df.schema[group_col], T.StructField("_tok", T.LongType())]
    )
    return df.select(group_col, text_col).mapInPandas(gen, out_schema)

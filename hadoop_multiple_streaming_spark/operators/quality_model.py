"""Model-based quality scoring — the fastText-classifier analogue for
corpus curation (public method: Joulin et al. 2016 "Bag of Tricks";
the CCNet / GPT-3 / LLaMA pipelines all filter with a linear
classifier distilled from proxy labels).

Split into the two phases a 100 TB pipeline actually has:

  * TRAIN (small, once): `train_quality_classifier` fits a
    pyspark.ml LogisticRegression over the integer feature vector and
    returns MICRO-QUANTIZED weights (round(w * 1e6) bigints). Training
    is iterative float optimization (LBFGS) — inherently not
    SQL-replayable, so it never sits on the correctness-gate path.
  * SCORE (100 TB, every run): `score_quality_classifier` applies
    frozen integer weights as a pure-JVM column expression —
    score_micro = sum(w_i * x_i) + b, predicted = score_micro >= 0
    (logit > 0 <=> p > 0.5). All-bigint arithmetic: hash-exact
    cross-engine, trivially SQL-replayable, scan-speed (no shuffle,
    no Python).

The features (`quality_features`) are deliberately interpretable
integers — token/char/punct counts, distinct-token count, mean word
length in 1/1000s — each exactly computable in any engine (no floats,
no hashing), so a frozen model's scores verify bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: feature order is the contract between train and score — weight i
#: multiplies FEATURE_COLS[i]; the final weight is the intercept.
FEATURE_COLS = ["f_tokens", "f_uniq", "f_chars", "f_punct", "f_meanwl_ppk"]


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document integer feature vector (id, *keep_cols, f_tokens,
    f_uniq, f_chars, f_punct, f_meanwl_ppk). One stateless projection —
    scan speed at 100 TB. Every feature is an exact integer:
    token count, distinct-token count, char count, punctuation char
    count, and mean word length in parts-per-thousand (one integer
    division). ``keep_cols`` carries metadata columns (language,
    source) through without a re-join."""
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col(text_col).alias("_t"),
        F.expr(f"array_remove(split({text_col}, ' '), '')").alias("_tk"),
    )
    n_tok = F.size("_tk").cast("long")
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        n_tok.alias("f_tokens"),
        F.size(F.array_distinct(F.col("_tk"))).cast("long").alias("f_uniq"),
        F.coalesce(F.length("_t"), F.lit(0)).cast("long").alias("f_chars"),
        F.coalesce(
            F.length(F.regexp_replace(F.col("_t"), r"[^.,!?;:]", "")), F.lit(0)
        ).cast("long").alias("f_punct"),
        # exact integer division (div), not double /: bit-for-bit SQL
        F.when(
            n_tok > 0,
            F.expr("(aggregate(_tk, 0L, (a, x) -> a + length(x)) * 1000L) div size(_tk)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("f_meanwl_ppk"),
    )


def train_quality_classifier(
    features: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> list[int]:
    """Fit LogisticRegression (pyspark.ml, LBFGS) on the
    `quality_features` columns against a 0/1 ``label_col`` and return
    the model as 6 micro-quantized bigints: [w_f_tokens, w_f_uniq,
    w_f_chars, w_f_punct, w_f_meanwl_ppk, intercept], each
    round(coef * 1e6). Standardization is disabled so the learned
    coefficients apply DIRECTLY to the raw integer features (the
    frozen-weight scorer has no access to training statistics).

    The returned list is the whole model — ship it as a literal into
    `score_quality_classifier` (and into a SQL oracle), exactly like
    the LSH plane matrices."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features", handleInvalid="skip"
    )
    vec = asm.transform(
        features.select(
            *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS],
            F.col(label_col).cast("double").alias("label"),
        )
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
        family="binomial",
    )
    model = lr.fit(vec)
    coefs = [float(c) for c in model.coefficients] + [float(model.intercept)]
    return [int(round(c * 1_000_000)) for c in coefs]


def score_quality_classifier(
    features: DataFrame,
    micro_weights: list[int],
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Apply frozen micro-quantized weights to `quality_features`
    output: (id, *keep_cols, score_micro, predicted). score_micro =
    the logit in micro units as an exact bigint (weights are
    micro-scaled, features are integers); predicted = score_micro >= 0.
    ``keep_cols`` carries feature columns through (e.g. f_tokens for a
    downstream token-budget fill) without a re-join. Pure column
    expressions — whole-stage codegen, no shuffle, hash-exact."""
    if len(micro_weights) != len(FEATURE_COLS) + 1:
        raise ValueError(
            f"score_quality_classifier: expected {len(FEATURE_COLS) + 1} "
            f"weights ({FEATURE_COLS} + intercept), got {len(micro_weights)}"
        )
    terms = [
        F.col(c) * F.lit(int(w)) for c, w in zip(FEATURE_COLS, micro_weights)
    ]
    score = sum(terms[1:], terms[0]) + F.lit(int(micro_weights[-1]))
    return features.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        score.cast("long").alias("score_micro"),
        (score >= 0).alias("predicted"),
    )

"""Model-based quality scoring: pyspark.ml training determinism,
distillation accuracy against the proxy labels, and exactness of the
frozen-integer-weight scorer."""

from pyspark.sql import functions as F

from hadoop_multiple_streaming_spark.operators.quality_model import (
    FEATURE_COLS,
    quality_features,
    score_quality_classifier,
    train_quality_classifier,
)

SF001 = "/root/testdata/sf0.01"


def _training_frame(spark):
    from hadoop_multiple_streaming_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    feats = quality_features(docs)
    labels = docs.select(
        "doc_id", (quality_score(F.col("text")) >= 0.71).cast("int").alias("label")
    )
    return feats, feats.join(labels, "doc_id")


def test_quality_model_train_deterministic_and_accurate(spark):
    feats, train = _training_frame(spark)
    w1 = train_quality_classifier(train, "label")
    w2 = train_quality_classifier(train, "label")
    assert w1 == w2, "LBFGS on identical data must reproduce weights"
    assert len(w1) == len(FEATURE_COLS) + 1
    scored = score_quality_classifier(feats, w1).join(
        train.select("doc_id", "label"), "doc_id"
    )
    acc = scored.select(
        F.avg((F.col("predicted").cast("int") == F.col("label")).cast("double"))
    ).collect()[0][0]
    # distillation fidelity: the linear model must reproduce the
    # heuristic's keep/drop decision on its own training corpus
    assert acc >= 0.85, f"distillation accuracy {acc}"
    # both classes actually predicted (no degenerate constant model)
    preds = {r.predicted for r in scored.select("predicted").distinct().collect()}
    assert preds == {True, False}


def test_quality_model_frozen_provenance(spark):
    """The committed FROZEN_QUALITY_WEIGHTS_V1 must be exactly what
    train_quality_classifier produces on the sf0.01 proxy labels —
    the provenance claim in workloads/text.py, kept honest."""
    from hadoop_multiple_streaming_spark.workloads.text import (
        FROZEN_QUALITY_WEIGHTS_V1,
    )

    _, train = _training_frame(spark)
    assert train_quality_classifier(train, "label") == FROZEN_QUALITY_WEIGHTS_V1


def test_score_quality_classifier_exact_integer_math(spark):
    """score_micro is the exact integer dot product of the features
    and the micro weights (checked against a python recompute), and a
    wrong weight count raises."""
    import pytest

    df = spark.createDataFrame(
        [(1, "alpha beta beta gamma."), (2, ""), (3, "x y")],
        "doc_id long, text string",
    )
    feats = quality_features(df)
    w = [3, -2, 1, 10, -1, 7]
    got = {
        r.doc_id: (r.score_micro, r.predicted)
        for r in score_quality_classifier(feats, w).collect()
    }
    rows = {r.doc_id: r for r in feats.collect()}
    for did, r in rows.items():
        exp = (
            3 * r.f_tokens
            - 2 * r.f_uniq
            + 1 * r.f_chars
            + 10 * r.f_punct
            - 1 * r.f_meanwl_ppk
            + 7
        )
        assert got[did] == (exp, exp >= 0), did
    with pytest.raises(ValueError, match="weights"):
        score_quality_classifier(feats, [1, 2, 3])


def test_quality_features_edge_cases(spark):
    """Empty and NULL text produce all-zero features, not NULLs."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab cd.")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in quality_features(df).collect()}
    assert (
        got[1].f_tokens,
        got[1].f_uniq,
        got[1].f_chars,
        got[1].f_punct,
        got[1].f_meanwl_ppk,
    ) == (0, 0, 0, 0, 0)
    assert got[3].f_tokens == 2 and got[3].f_punct == 1
    assert got[3].f_meanwl_ppk == (2 + 3) * 1000 // 2

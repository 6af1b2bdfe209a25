"""Model-based quality filter (operators/classifier.py): MLlib LR over
the engine's quality signals separates reference-like prose from junk."""

from __future__ import annotations

import random

from pcap_converter_spark.operators.classifier import (
    quality_features,
    score_quality,
    train_quality_classifier,
)


def _good(i: int) -> str:
    words = ["the", "cat", "sat", "on", "a", "mat", "and", "then",
             "walked", "to", "town", "with", "friends", "for", "dinner"]
    rng = random.Random(i)
    return " ".join(rng.choices(words, k=40))


def _junk(i: int) -> str:
    rng = random.Random(1000 + i)
    if i % 3 == 0:
        return "click here " * 20  # repetition
    if i % 3 == 1:
        return " ".join("x" * rng.randint(15, 25) for _ in range(30))  # long tokens
    return "!!! ??? $$$ %% ^^ && ** (( )) " * 8  # punctuation soup


def test_classifier_separates_good_from_junk(spark):
    rows = [(i, _good(i), 1) for i in range(40)] + [
        (100 + i, _junk(i), 0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_quality_classifier(df)
    scored = {r["doc_id"]: r for r in score_quality(df, model).collect()}
    good_scores = [scored[i]["quality_score"] for i in range(40)]
    junk_scores = [scored[100 + i]["quality_score"] for i in range(40)]
    assert min(good_scores) > max(junk_scores)
    assert all(scored[i]["quality_pred"] for i in range(40))
    assert not any(scored[100 + i]["quality_pred"] for i in range(40))
    # held-out texts in each style classify correctly too
    held = spark.createDataFrame(
        [(900, _good(999)), (901, _junk(998))], "doc_id long, text string"
    )
    hs = {r["doc_id"]: r["quality_pred"]
          for r in score_quality(held, model).collect()}
    assert hs[900] and not hs[901]


def test_literal_fold_matches_pipeline_model(spark):
    """score_quality_literal under folded raw-space weights reproduces the
    fitted PipelineModel's probabilities exactly (to the 4-decimal
    rounding both use) — including a zero-variance feature, which folds to
    w' = 0 to match StandardScaler's 0.0 output for σ = 0 columns."""
    import numpy as np

    from pcap_converter_spark.operators.classifier import (
        FEATURE_COLS,
        score_quality_literal,
    )

    rows = [(i, _good(i), 1) for i in range(30)] + [
        (100 + i, _junk(i), 0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    pm = train_quality_classifier(df)
    _, scaler, lr = pm.stages
    mean, std = scaler.mean.toArray(), scaler.std.toArray()
    coef, b = lr.coefficients.toArray(), lr.intercept
    nz = std != 0
    w_raw = np.where(nz, coef / np.where(nz, std, 1.0), 0.0)
    b_raw = b - float(np.sum(np.where(nz, coef * mean / np.where(nz, std, 1.0), 0.0)))
    lit = {
        r["doc_id"]: r
        for r in score_quality_literal(
            df, [float(x) for x in w_raw], b_raw
        ).collect()
    }
    ref = {r["doc_id"]: r for r in score_quality(df, pm).collect()}
    assert len(FEATURE_COLS) == len(w_raw)
    for did, r in ref.items():
        assert abs(lit[did]["quality_score"] - r["quality_score"]) <= 1e-4
        assert lit[did]["quality_pred"] == r["quality_pred"]


def test_quality_features_shape(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat quietly today")],
        "doc_id long, text string",
    )
    r = quality_features(df).collect()[0]
    assert r["f_tokens"] == 8.0
    assert r["f_stop"] >= 2.0
    assert r["f_dup2"] == 0.0

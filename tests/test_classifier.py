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


def test_quality_features_shape(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat quietly today")],
        "doc_id long, text string",
    )
    r = quality_features(df).collect()[0]
    assert r["f_tokens"] == 8.0
    assert r["f_stop"] >= 2.0
    assert r["f_dup2"] == 0.0
